#!/usr/bin/env bash
# Reproduce RESULTS.md: every BASELINE.md config as one CLI command.
# Runs on the default backend (TPU if available); cfg 1 forces CPU per spec.
set -e
cd "$(dirname "$0")/.."

echo "### cfg1: synthetic 1PL 1k x 100, CPU"
python -m vibo_tpu.cli train synthetic-1pl --irt-model 1pl \
    --num-persons 1000 --num-items 100 --epochs 200 --eval-every 100 --cpu

echo "### cfg2: synthetic 2PL/3PL K=2, MAR 0.2, IWAE-100"
python -m vibo_tpu.cli train synthetic-2pl --num-persons 2000 --num-items 200 \
    --ability-dim 2 --missing-rate 0.2 --epochs 300 --eval-every 100 \
    --iwae-samples 100
python -m vibo_tpu.cli train synthetic-3pl --irt-model 3pl --num-persons 2000 \
    --num-items 200 --ability-dim 2 --missing-rate 0.2 --epochs 300 \
    --eval-every 100 --iwae-samples 100

echo "### cfg3: PISA 2PL held-out imputation"
python -m vibo_tpu.cli train pisa --irt-model 2pl --ability-dim 2 \
    --epochs 300 --eval-every 100

echo "### cfg4: WordBank + DuoLingo scale, amortized new persons"
python -m vibo_tpu.cli train wordbank --irt-model 2pl --ability-dim 2 \
    --epochs 300 --eval-every 100
python -m vibo_tpu.cli train duolingo --irt-model 2pl --ability-dim 4 \
    --epochs 100 --eval-every 50 --eval-new-persons 0.1

echo "### flagship: K=4 north-star, mean-field + restart selection"
python -m vibo_tpu.cli train synthetic-2pl --num-persons 10240 \
    --num-items 1024 --ability-dim 4 --hidden-dim 512 --mean-field \
    --num-posterior-samples 5 --epochs 1500 --restarts 4

echo "### flagship variants: full-covariance q(theta) / structured-stats family"
python -m vibo_tpu.cli train synthetic-2pl --num-persons 10240 \
    --num-items 1024 --ability-dim 4 --hidden-dim 512 --mean-field \
    --theta-posterior chol --num-posterior-samples 5 --epochs 1500 --restarts 4
python -m vibo_tpu.cli train synthetic-2pl --num-persons 10240 \
    --num-items 1024 --ability-dim 4 --hidden-dim 512 --condition-on stats \
    --num-posterior-samples 5 --epochs 1500 --restarts 4

echo "### K=4 posterior agreement vs the cached gold (encoder + Laplace widths)"
# samples the 75-min gold into artifacts/gold/k4 on first run; reloads after
python -m vibo_tpu.cli compare synthetic-2pl --num-persons 10240 \
    --num-items 1024 --ability-dim 4 --hidden-dim 512 --condition-on stats \
    --theta-posterior chol --num-posterior-samples 5 --epochs 1500 \
    --restarts 4 --methods hmc --hmc-warmup 800 --hmc-samples 1600 \
    --hmc-chains 4 --hmc-leapfrog 64 --hmc-target-accept 0.65 \
    --hmc-cache artifacts/gold/k4

echo "### K=4 amortized widths: Fisher-anchored laplace family vs the gold"
python -m vibo_tpu.cli compare synthetic-2pl --num-persons 10240 \
    --num-items 1024 --ability-dim 4 --hidden-dim 512 --condition-on stats \
    --theta-posterior laplace --num-posterior-samples 5 --epochs 1500 \
    --restarts 4 --methods hmc --hmc-warmup 800 --hmc-samples 1600 \
    --hmc-chains 4 --hmc-leapfrog 64 --hmc-target-accept 0.65 \
    --hmc-cache artifacts/gold/k4

echo "### K=4 amortized widths at the closed-form ceiling: weighted anchor"
python -m vibo_tpu.cli compare synthetic-2pl --num-persons 10240 \
    --num-items 1024 --ability-dim 4 --hidden-dim 512 --condition-on stats \
    --theta-posterior laplace-w --num-posterior-samples 5 --epochs 1500 \
    --restarts 4 --methods hmc --hmc-warmup 800 --hmc-samples 1600 \
    --hmc-chains 4 --hmc-leapfrog 64 --hmc-target-accept 0.65 \
    --hmc-cache artifacts/gold/k4

echo "### cfg3b: CritLangAcq (Rasch/1PL) + Gradescope partial credit (GRM)"
python -m vibo_tpu.cli compare critlangacq --irt-model 1pl --ability-dim 1 \
    --epochs 300 --methods mle,em --cpu
python -m vibo_tpu.cli compare gradescope --irt-model grm \
    --num-categories 5 --ability-dim 1 --epochs 300 --methods mle,em --cpu

echo "### nonlinear-generated data: deep link vs (misspecified) 2PL, IWAE-100"
python -m vibo_tpu.cli train synthetic-nonlinear --num-persons 2000 \
    --num-items 200 --ability-dim 2 --epochs 300 --eval-every 100 \
    --iwae-samples 100 --restarts 2 --num-posterior-samples 5
python -m vibo_tpu.cli train synthetic-nonlinear --num-persons 2000 \
    --num-items 200 --ability-dim 2 --irt-model deep --epochs 300 \
    --eval-every 100 --iwae-samples 100 --restarts 2 --num-posterior-samples 5

echo "### cfg5: deep link + parity sweep"
python -m vibo_tpu.cli train wordbank --irt-model deep --epochs 200 \
    --eval-every 100
python -m vibo_tpu.cli compare synthetic-2pl --num-persons 10240 \
    --num-items 1024 --epochs 1500 --hidden-dim 512 --steps 800 \
    --hmc-warmup 500 --hmc-samples 800 --hmc-leapfrog 64 \
    --hmc-target-accept 0.65
# deep gold posterior: joint (theta, d) HMC under the trained deep decoder
# (samples into artifacts/gold/deep on first run; reloads after)
python -m vibo_tpu.cli compare synthetic-nonlinear --num-persons 2000 \
    --num-items 200 --ability-dim 2 --irt-model deep --epochs 300 \
    --num-posterior-samples 5 --restarts 2 --methods hmc \
    --hmc-warmup 1200 --hmc-samples 2400 --hmc-chains 4 --hmc-leapfrog 128 \
    --hmc-target-accept 0.65 --hmc-cache artifacts/gold/deep

echo "### graded response model (polytomous, C=5): parity sweep vs MLE + HMC gold"
# samples the GRM gold into artifacts/gold/grm on first run; reloads after
python -m vibo_tpu.cli compare synthetic-grm --irt-model grm \
    --num-categories 5 --num-persons 2000 --num-items 100 --epochs 500 \
    --num-posterior-samples 5 --restarts 2 --steps 600 \
    --hmc-warmup 800 --hmc-samples 1600 --hmc-chains 4 --hmc-leapfrog 64 \
    --hmc-target-accept 0.65 --hmc-cache artifacts/gold/grm

echo "### item-parameter agreement sweep vs a NUTS gold (b_vs_hmc / a_vs_hmc)"
python -m vibo_tpu.cli compare synthetic-2pl --num-persons 2000 \
    --num-items 200 --ability-dim 2 --epochs 500 \
    --num-posterior-samples 5 --restarts 2 --condition-on stats \
    --theta-posterior laplace-w --methods mle,em,hmc \
    --hmc-warmup 800 --hmc-samples 1200 --hmc-chains 4 \
    --hmc-trajectory nuts --hmc-tree-depth 7 --hmc-target-accept 0.8 \
    --hmc-cache artifacts/gold/k2-nuts

echo "### graded response model at K=2: NUTS gold + parity (round 5)"
# samples the K=2 GRM gold (NUTS) into artifacts/gold/grm-k2 on first run
python -m vibo_tpu.cli compare synthetic-grm --irt-model grm \
    --num-categories 5 --num-persons 2000 --num-items 200 --ability-dim 2 \
    --epochs 500 --num-posterior-samples 5 --restarts 2 --steps 600 \
    --methods mle,hmc --hmc-warmup 800 --hmc-samples 1200 --hmc-chains 4 \
    --hmc-trajectory nuts --hmc-tree-depth 7 --hmc-target-accept 0.8 \
    --hmc-cache artifacts/gold/grm-k2

echo "### graded K=2 amortized widths: stats conditioning + weighted anchor"
python -m vibo_tpu.cli compare synthetic-grm --irt-model grm \
    --num-categories 5 --num-persons 2000 --num-items 200 --ability-dim 2 \
    --epochs 500 --num-posterior-samples 5 --restarts 2 \
    --condition-on stats --theta-posterior laplace-w \
    --methods hmc --hmc-warmup 800 --hmc-samples 1200 --hmc-chains 4 \
    --hmc-trajectory nuts --hmc-tree-depth 7 --hmc-target-accept 0.8 \
    --hmc-cache artifacts/gold/grm-k2

echo "### graded K=2 at the converged operating point: accuracy at the gold"
python -m vibo_tpu.cli compare synthetic-grm --irt-model grm \
    --num-categories 5 --num-persons 2000 --num-items 200 --ability-dim 2 \
    --epochs 1500 --num-posterior-samples 5 --restarts 4 --hidden-dim 512 \
    --condition-on stats --theta-posterior laplace-w \
    --methods hmc --hmc-warmup 800 --hmc-samples 1200 --hmc-chains 4 \
    --hmc-trajectory nuts --hmc-tree-depth 7 --hmc-target-accept 0.8 \
    --hmc-cache artifacts/gold/grm-k2

echo "### graded K=4: the binary flagship's ability dimension, same recipe"
python -m vibo_tpu.cli compare synthetic-grm --irt-model grm \
    --num-categories 5 --num-persons 2000 --num-items 200 --ability-dim 4 \
    --epochs 1500 --num-posterior-samples 5 --restarts 4 --hidden-dim 512 \
    --condition-on stats --theta-posterior laplace-w \
    --methods mle,hmc --hmc-warmup 800 --hmc-samples 1200 --hmc-chains 4 \
    --hmc-trajectory nuts --hmc-tree-depth 7 --hmc-target-accept 0.8 \
    --hmc-cache artifacts/gold/grm-k4

echo "### graded EM baseline (Bock-Aitkin MML for the GRM, K=1 classical)"
python -m vibo_tpu.cli baseline synthetic-grm --irt-model grm \
    --num-categories 5 --num-persons 2000 --num-items 100 --method em --cpu

echo "### throughput north star"
python bench.py

echo "### graded-family north star: fused GRM kernel at 10,240 x 1,024 (C=5)"
python bench.py --irt-model grm --ability-dim 2

echo "### generalized partial credit (GPCM, C=5): parity sweep vs MLE/EM + NUTS gold"
# the second polytomous family (round 5); gold cached in artifacts/gold/gpcm
python -m vibo_tpu.cli compare synthetic-gpcm --irt-model gpcm \
    --num-categories 5 --num-persons 2000 --num-items 100 --epochs 500 \
    --num-posterior-samples 5 --restarts 2 --steps 600 \
    --hmc-warmup 800 --hmc-samples 1600 --hmc-chains 4 \
    --hmc-trajectory nuts --hmc-tree-depth 7 --hmc-target-accept 0.8 \
    --hmc-cache artifacts/gold/gpcm

echo "### partial-credit north star: fused GPCM kernel at 10,240 x 1,024 (C=5)"
python bench.py --irt-model gpcm --ability-dim 2
