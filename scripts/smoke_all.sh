#!/usr/bin/env bash
# End-to-end smoke of every CLI on the synthetic dataset (no assets).
# SCD_PLATFORM=cpu to keep it off the TPU tunnel; drop it to run on chip.
set -ex
export SCD_PLATFORM="${SCD_PLATFORM:-cpu}"
TMP=$(mktemp -d)
trap "rm -rf $TMP" EXIT

python -m scd_tpu.pipelines.unsup --dataset_name synthetic --cluster SSKM \
    --n_cluster 10 --te --cache_dir "$TMP/cache"
python -m scd_tpu.pipelines.ptsup --dataset_name synthetic --cluster ConSSKM \
    --n_cluster 10 --cluster_size_min 5 --cluster_size_max 50 \
    --cache_dir "$TMP/cache"
python -m scd_tpu.pipelines.extract --dataset_name synthetic \
    --feat_model synthetic --save_dir "$TMP/feats"
python -m scd_tpu.cluster.runners \
    --features "$TMP/feats/train/features_packed.npz" \
    --n_train_classes 5 --semi_sup --K 10 --n_init 3
python -m scd_tpu.cluster.estimate_k --min_k 10 --max_k 1000
python -m scd_tpu.train.run_baseline --method uno \
    --features "$TMP/feats/train/features_packed.npz" --n_labeled 5 \
    --epochs 2 --batch_size 64
python -m scd_tpu.train.run_baseline --method supervised \
    --features "$TMP/feats/train/features_packed.npz" --n_labeled 5 --epochs 3
python -m scd_tpu.train.metric_learn --dataset_name synthetic --epochs 1 \
    --vit micro --image_size 32 --batch_size 8 --steps_per_epoch 2 \
    --proj_dim 32 --grad_from_block 0 --max_kmeans_iter 10 \
    --exp_root "$TMP/runs"
python -m scd_tpu.train.run_baseline_e2e --method uno \
    --dataset_name synthetic --vit micro --image_size 32 --epochs 1 \
    --batch_size 32 --num_heads 2
python -m scd_tpu.pipelines.infer --dataset_name synthetic --topk 3
if [ "$SCD_PLATFORM" != "cpu" ]; then
    # on-chip Mosaic parity (compiled Pallas kernels vs XLA at real shapes)
    SCD_TEST_PLATFORM=axon python -m pytest tests/test_pallas_on_tpu.py -q
fi
echo "ALL CLIS OK"
