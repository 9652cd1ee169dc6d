"""Hold-out masking, train/test person splits, and the Dataset container.

Implements the reference's evaluation protocol (SURVEY.md sections 3.3, 4.3;
arXiv:2002.00276 section 6.3): artificially hide a fraction (default 10%) of
*observed* cells; train on the remainder; the hidden cells form the
missing-response imputation set. Separately, persons can be split into
train/test groups to evaluate amortization on unseen students.

All arrays stay dense (TPU-friendly); sparsity is carried by the masks.
Padding helpers round the student/item axes up to multiples (MXU/VPU tiling,
even mesh sharding) — padded cells simply carry mask = 0 so every objective
ignores them by construction.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(eq=False)
class Dataset:
    """Dense response data with train/held-out masks. (eq=False: identity
    hashing — evaluation caches device buffers per Dataset instance.)

    response:    (N, M) float32 {0,1}; zero where unobserved. Polytomous
                 (grm) datasets carry ordinal categories {0..C-1} with
                 num_categories = C > 2.
    train_mask:  (N, M) float32; observed cells used for training.
    heldout_mask:(N, M) float32; observed cells hidden for imputation eval.
                 Disjoint from train_mask; train+heldout = observed.
    num_persons / num_items may be smaller than the padded array shape.
    person_ids / item_ids: optional raw-id vocabularies (row/column order)
                 carried from real-dataset ingestion; item_ids is embedded in
                 training checkpoints so `cli score` can align new students'
                 long-format CSVs to the trained column order.
    """
    response: np.ndarray
    train_mask: np.ndarray
    heldout_mask: np.ndarray
    name: str = "dataset"
    num_persons: int | None = None
    num_items: int | None = None
    person_ids: list | None = None
    item_ids: list | None = None
    num_categories: int = 2

    def __post_init__(self):
        if self.num_persons is None:
            self.num_persons = self.response.shape[0]
        if self.num_items is None:
            self.num_items = self.response.shape[1]

    @property
    def shape(self):
        return self.response.shape


def holdout_split(response: np.ndarray, mask: np.ndarray,
                  holdout_frac: float = 0.1, seed: int = 0,
                  name: str = "dataset", person_ids: list | None = None,
                  item_ids: list | None = None,
                  num_categories: int = 2) -> Dataset:
    """Hide `holdout_frac` of the observed cells uniformly at random.

    Streams in row blocks: `Generator.random` fills its output sequentially
    from the bit stream, so drawing block-by-block from one generator yields
    the EXACT same hide pattern as one (N, M) draw (asserted in
    tests/test_data.py) while keeping peak temporaries at ~3 row-blocks
    instead of ~5 full matrices — at 131k x 2k the one-shot form allocated
    ~6 GB of f64/bool scratch and took 44 s on this page-fault-bound host."""
    from vibo_tpu.utils.hostmem import empty_hugepages
    rng = np.random.default_rng(seed + 101)
    n, m = mask.shape
    heldout_mask = empty_hugepages((n, m), np.float32)
    train_mask = empty_hugepages((n, m), np.float32)
    block = max(1, min(n, (1 << 24) // max(1, m)))   # ~16M cells per block
    # scratch allocated once (in-place RNG fill draws the identical stream):
    # per-iteration fresh temporaries re-pay the first-touch penalty every
    # loop on this image because freed pages are returned to the hypervisor
    rbuf = empty_hugepages((block, m), np.float64)
    observed = np.empty((block, m), bool)
    hide = np.empty((block, m), bool)
    for s in range(0, n, block):
        e = min(n, s + block)
        b = e - s
        rng.random(out=rbuf[:b])
        np.greater(mask[s:e], 0, out=observed[:b])
        np.less(rbuf[:b], holdout_frac, out=hide[:b])
        hide[:b] &= observed[:b]
        np.copyto(heldout_mask[s:e], hide[:b], casting="unsafe")
        np.logical_not(hide[:b], out=hide[:b])
        observed[:b] &= hide[:b]
        np.copyto(train_mask[s:e], observed[:b], casting="unsafe")
    return Dataset(response=np.asarray(response, np.float32),
                   train_mask=train_mask, heldout_mask=heldout_mask, name=name,
                   person_ids=person_ids, item_ids=item_ids,
                   num_categories=num_categories)


def split_persons(ds: Dataset, test_frac: float = 0.1, seed: int = 0
                  ) -> tuple[Dataset, Dataset]:
    """Split persons into train/test groups (amortized-inference eval on new
    students, arXiv:2002.00276 section 6: the amortization headline)."""
    rng = np.random.default_rng(seed + 202)
    n = ds.response.shape[0]
    perm = rng.permutation(n)
    n_test = max(1, int(round(n * test_frac)))
    test_idx, train_idx = np.sort(perm[:n_test]), np.sort(perm[n_test:])

    def take(idx, tag):
        pids = ([ds.person_ids[k] for k in idx]
                if ds.person_ids is not None else None)
        return Dataset(response=ds.response[idx], train_mask=ds.train_mask[idx],
                       heldout_mask=ds.heldout_mask[idx], name=f"{ds.name}/{tag}",
                       person_ids=pids, item_ids=ds.item_ids,
                       num_categories=ds.num_categories)
    return take(train_idx, "train"), take(test_idx, "test")


def split_items(ds: Dataset, test_frac: float = 0.1, seed: int = 0
                ) -> tuple[Dataset, Dataset]:
    """Split ITEMS into train/test column groups (cold-start eval: infer
    posteriors for items the model never trained on from their response
    columns alone — requires the amortized item posterior,
    VIBOConfig(item_encoder=True))."""
    rng = np.random.default_rng(seed + 808)
    m = ds.response.shape[1]
    perm = rng.permutation(m)
    m_test = max(1, int(round(m * test_frac)))
    test_idx, train_idx = np.sort(perm[:m_test]), np.sort(perm[m_test:])

    def take(idx, tag):
        iids = ([ds.item_ids[k] for k in idx]
                if ds.item_ids is not None else None)
        return Dataset(response=ds.response[:, idx],
                       train_mask=ds.train_mask[:, idx],
                       heldout_mask=ds.heldout_mask[:, idx],
                       name=f"{ds.name}/{tag}",
                       person_ids=ds.person_ids, item_ids=iids,
                       num_categories=ds.num_categories)
    return take(train_idx, "train-items"), take(test_idx, "test-items")


def pad_to_multiple(ds: Dataset, person_multiple: int = 8,
                    item_multiple: int = 128) -> Dataset:
    """Zero-pad students/items up to tile multiples. Padded cells have mask=0
    everywhere, so objectives and metrics are unchanged exactly."""
    n, m = ds.response.shape
    np_pad = (-n) % person_multiple
    mi_pad = (-m) % item_multiple
    if np_pad == 0 and mi_pad == 0:
        return ds
    pad = ((0, np_pad), (0, mi_pad))
    return Dataset(
        response=np.pad(ds.response, pad), train_mask=np.pad(ds.train_mask, pad),
        heldout_mask=np.pad(ds.heldout_mask, pad), name=ds.name,
        num_persons=n, num_items=m,
        person_ids=ds.person_ids, item_ids=ds.item_ids,
        num_categories=ds.num_categories)


def batch_iterator(ds: Dataset, batch_size: int, seed: int, epoch: int):
    """Yield (response, train_mask) person-minibatches, reshuffled per epoch.

    The last partial batch is zero-padded (mask=0 rows) so every step has a
    static shape — one XLA compilation for the whole run.
    """
    n = ds.response.shape[0]
    rng = np.random.default_rng((seed * 100003 + epoch) & 0x7FFFFFFF)
    perm = rng.permutation(n)
    for start in range(0, n, batch_size):
        idx = perm[start:start + batch_size]
        resp = ds.response[idx]
        mask = ds.train_mask[idx]
        if idx.shape[0] < batch_size:
            pad = batch_size - idx.shape[0]
            resp = np.concatenate([resp, np.zeros((pad, resp.shape[1]), resp.dtype)])
            mask = np.concatenate([mask, np.zeros((pad, mask.shape[1]), mask.dtype)])
        yield resp, mask
