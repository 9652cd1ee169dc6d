"""Native C++ loader vs the Python reference implementation: byte-identical
matrices on the same CSV, plus a throughput sanity check."""

import csv
import os
import time

import numpy as np
import pytest

from vibo_tpu.data import native
from vibo_tpu.data.loaders import long_to_matrix

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _write_csv(path, rows, header=("student_id", "item_id", "correct")):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def test_matches_python_reference(tmp_path, rng):
    rows = []
    for p in range(80):
        for i in range(40):
            if rng.random() < 0.6:
                rows.append((f"p{p:03d}", f"i{i:02d}", int(rng.random() < 0.5)))
    # duplicates: last wins
    rows.append(("p000", "i00", 1))
    rows.append(("p000", "i00", 0))
    # a person and an item below the min-count filter
    rows.append(("rare_person", "i00", 1))
    rows.append(("p001", "rare_item", 1))
    path = tmp_path / "data.csv"
    _write_csv(path, rows)

    resp_n, mask_n, pids, iids = native.parse_long_csv(
        str(path), "student_id", "item_id", "correct")
    resp_p, mask_p = long_to_matrix(
        [(str(p), str(i), float(c)) for p, i, c in rows])
    np.testing.assert_array_equal(resp_n, resp_p)
    np.testing.assert_array_equal(mask_n, mask_p)
    assert pids == sorted(pids) and iids == sorted(iids)
    assert "rare_person" not in pids and "rare_item" not in iids


def test_missing_column_error(tmp_path):
    path = tmp_path / "bad.csv"
    _write_csv(path, [("a", "b", 1)], header=("x", "y", "z"))
    with pytest.raises(ValueError, match="missing column"):
        native.parse_long_csv(str(path), "student_id", "item_id", "correct")


@pytest.mark.slow  # perf assertion; correctness stays fast via the
# matches_python/mode tests above, scale via test_native_parse_at_scale
def test_throughput_vs_python(tmp_path, rng):
    """Native should beat the Python csv path by a wide margin."""
    rows = [(f"u{p%2000}", f"lex{i%500}", int((p + i) % 2))
            for p in range(2000) for i in range(100)]
    path = tmp_path / "big.csv"
    _write_csv(path, rows)

    t0 = time.perf_counter()
    resp_n, mask_n, _, _ = native.parse_long_csv(
        str(path), "student_id", "item_id", "correct")
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    resp_p, mask_p = long_to_matrix(
        [(str(p), str(i), float(c)) for p, i, c in rows])
    t_python = time.perf_counter() - t0

    np.testing.assert_array_equal(resp_n, resp_p)
    assert t_native < t_python, (t_native, t_python)


def test_load_dataset_uses_native(tmp_path):
    from vibo_tpu.data import load_dataset
    rows = [(p, i, int((p * 7 + i) % 3 > 0)) for p in range(30) for i in range(12)]
    _write_csv(tmp_path / "pisa.csv", rows)
    ds = load_dataset("pisa", data_dir=str(tmp_path), seed=0)
    assert ds.name == "pisa"
    assert ds.response.shape == (30, 12)


def test_long_lines_not_split(tmp_path, rng):
    """Lines longer than any fixed buffer must stay one record (round-1
    advisor: a 64 KiB fgets buffer silently split them into phantom rows)."""
    long_id = "p" + "x" * 100_000  # one ~100 KB field
    rows = [(long_id, f"i{i}", int(rng.random() < 0.5)) for i in range(12)]
    rows += [(f"q{p}", f"i{i}", 1) for p in range(8) for i in range(12)]
    path = tmp_path / "long.csv"
    _write_csv(path, rows)
    resp_n, mask_n, pids, iids = native.parse_long_csv(
        str(path), "student_id", "item_id", "correct")
    resp_p, mask_p = long_to_matrix(
        [(str(p), str(i), float(c)) for p, i, c in rows])
    np.testing.assert_array_equal(resp_n, resp_p)
    np.testing.assert_array_equal(mask_n, mask_p)
    assert long_id in pids and len(pids) == 9


def test_malformed_numeric_raises(tmp_path):
    """Non-numeric correct values must raise (like the Python path's
    float()), not silently coerce to 'incorrect' (round-1 advisor)."""
    path = tmp_path / "bad.csv"
    _write_csv(path, [("p0", "i0", 1), ("p0", "i1", "oops"), ("p1", "i0", 0)])
    with pytest.raises(ValueError, match="unparseable"):
        native.parse_long_csv(str(path), "student_id", "item_id", "correct",
                              min_per_person=1, min_per_item=1)


def _load_both(tmp_path, name, header, rows):
    """Load a fixture through load_dataset twice: native on and off."""
    import csv as _csv

    from vibo_tpu.data import load_dataset
    from vibo_tpu.data import native as nat
    path = tmp_path / f"{name}.csv"
    with open(path, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(header)
        w.writerows(rows)
    ds_native = load_dataset(name, data_dir=str(tmp_path), seed=0)
    orig = nat.available
    nat.available = lambda: False
    try:
        ds_python = load_dataset(name, data_dir=str(tmp_path), seed=0)
    finally:
        nat.available = orig
    return ds_native, ds_python


def test_duolingo_threshold_mode_matches_python(tmp_path, rng):
    rows = [(f"u{p}", f"lex{i}", int(rng.integers(0, 4)), 3)
            for p in range(20) for i in range(15) if rng.random() < 0.8]
    ds_n, ds_p = _load_both(
        tmp_path, "duolingo",
        ("user_id", "lexeme_id", "session_correct", "session_seen"),
        [(u, l, c, min(c, s) if c else s) for u, l, c, s in rows])
    np.testing.assert_array_equal(ds_n.response, ds_p.response)
    np.testing.assert_array_equal(ds_n.train_mask, ds_p.train_mask)


def test_wordbank_string_mode_matches_python(tmp_path, rng):
    vals = ["produces", "understands", "", " Produces "]
    rows = [(f"c{p}", f"w{i}", vals[int(rng.integers(0, 4))])
            for p in range(20) for i in range(15)]
    ds_n, ds_p = _load_both(
        tmp_path, "wordbank", ("child_id", "item_definition", "value"), rows)
    np.testing.assert_array_equal(ds_n.response, ds_p.response)
    np.testing.assert_array_equal(ds_n.train_mask, ds_p.train_mask)


def test_gradescope_denom_mode_matches_python(tmp_path, rng):
    rows = [(f"s{p}", f"q{i}", float(rng.integers(0, 11)), 10.0)
            for p in range(25) for i in range(8)]
    ds_n, ds_p = _load_both(
        tmp_path, "gradescope",
        ("student_id", "question_id", "score", "max_score"), rows)
    np.testing.assert_array_equal(ds_n.response, ds_p.response)
    np.testing.assert_array_equal(ds_n.train_mask, ds_p.train_mask)


@pytest.mark.slow
def test_native_parse_at_scale_matches_python(tmp_path):
    """Generate a DuoLingo-format trace file at reduced scale (2M rows) with
    scripts/gen_duolingo_csv.py, ingest through the native loader, and assert
    bitwise equality with the Python path + a real speed advantage. The full
    13M-row measurement lives in RESULTS.md."""
    import sys
    import time

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import gen_duolingo_csv

    path = tmp_path / "duolingo.csv"
    gen_duolingo_csv.generate(str(path), rows=2_000_000, users=20_000,
                              lexemes=512, seed=1)

    from vibo_tpu.data import native
    if not native.available():
        pytest.skip("native loader unavailable")
    t0 = time.perf_counter()
    resp_n, mask_n, pids, iids = native.parse_long_csv(
        str(path), "user_id", "lexeme_id", "session_correct",
        denom_col="session_seen", mode=native.BINARIZE_GE_DENOM_OPT,
        min_per_person=5, min_per_item=5)
    t_native = time.perf_counter() - t0

    from vibo_tpu.data.loaders import long_to_matrix, _read_csv
    t0 = time.perf_counter()
    rows = [(r["user_id"], r["lexeme_id"],
             1.0 if float(r["session_correct"]) >= float(r["session_seen"])
             else 0.0) for r in _read_csv(str(path))]
    resp_p, mask_p = long_to_matrix(rows, min_per_person=5, min_per_item=5)
    t_python = time.perf_counter() - t0

    np.testing.assert_array_equal(mask_n, mask_p)
    np.testing.assert_array_equal(resp_n, resp_p)
    assert pids == sorted(pids) and iids == sorted(iids)
    assert t_native < t_python, (t_native, t_python)
