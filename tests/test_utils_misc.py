"""Coverage for the small utility surfaces: WTA hashing, the JSONL metric
stream, timing/profiling helpers, and the plot savers (reference
``local_utils/wta.py``, ``slurm_out_parser.py``-replacement,
``util.py:178-247``)."""

import os

import numpy as np
import pytest


def test_wta_hash_properties(rng):
    """WTA codes are rank-order hashes: invariant to monotone feature
    scaling, sensitive to reordering (reference ``wta.py:14-24``)."""
    import jax

    from scd_tpu.ops.wta import hash_transform, structured_hash_idx, wta_hash

    feats = rng.standard_normal((16, 64)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    idx = structured_hash_idx(key, 64, hash_code_dim=32, hash_win_len=4)
    assert idx.shape == (32, 4) and int(idx.max()) < 64

    codes = np.asarray(wta_hash(feats, idx))
    assert codes.shape == (16, 32) and codes.max() < 4
    # monotone transform invariance (rank order preserved)
    codes2 = np.asarray(wta_hash(feats * 3.0 + 1.0, idx))
    np.testing.assert_array_equal(codes, codes2)
    # same call through the one-shot API is deterministic per key
    c1 = np.asarray(hash_transform(key, feats, 32, 4))
    c2 = np.asarray(hash_transform(key, feats, 32, 4))
    np.testing.assert_array_equal(c1, c2)


def test_metric_writer_roundtrip(tmp_path):
    from scd_tpu.utils.experiment import MetricWriter, read_scalars

    w = MetricWriter(str(tmp_path))
    w.add_scalar("loss", 1.5, step=0)
    w.add_scalar("loss", 1.2, step=1)
    w.add_scalars("acc", {"old": 0.5, "new": 0.7}, step=1)
    w.add_hparams({"lr": 0.1, "name": "x", "skip": [1, 2]})
    w.close()

    scalars = read_scalars(str(tmp_path))
    np.testing.assert_allclose(scalars["loss"],
                               [[0, 1.5], [1, 1.2]])
    np.testing.assert_allclose(scalars["acc/old"], [[1, 0.5]])
    import json

    hp = json.load(open(tmp_path / "hparams.json"))
    assert hp == {"lr": 0.1, "name": "x"}  # non-scalar values dropped
    assert read_scalars(str(tmp_path / "missing")) == {}


def test_block_timed_and_profile_trace(tmp_path):
    import jax.numpy as jnp

    from scd_tpu.utils.runtime import block_timed, profile_trace

    results = {}
    with block_timed("stage", results):
        _ = jnp.ones((8, 8)).sum()
    assert results["stage"] >= 0.0

    with profile_trace(str(tmp_path / "trace")):
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert os.path.isdir(tmp_path / "trace")


def test_plot_savers(tmp_path, rng):
    pytest.importorskip("matplotlib")
    from scd_tpu.utils.plots import save_cvi_curves, save_heatmap, save_tsne

    emb = rng.standard_normal((60, 8)).astype(np.float32)
    labels = rng.integers(0, 3, 60)
    p1 = str(tmp_path / "tsne.png")
    save_tsne(emb, labels, path=p1)
    p2 = str(tmp_path / "heat.png")
    save_heatmap(rng.random((6, 4)), path=p2)
    p3 = str(tmp_path / "cvi.png")
    save_cvi_curves([[0.5, 0.4, 0.3], [0.6, 0.5, 0.4]], k_list=[5, 10],
                    path=p3)
    for p in (p1, p2, p3):
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_parse_run_log(tmp_path):
    """Log scraper (reference ``slurm_out_parser.py`` capability over this
    repo's printout formats): hparams from the Namespace echo, every
    Accuracies line in order, voting metric blocks, epochs, IoU."""
    from scd_tpu.utils.logparse import parse_run_log, summarize_runs

    log = tmp_path / "run.log"
    log.write_text(
        "Namespace(dataset_name='cub', lr=0.1, n_cluster=100, te=False)\n"
        "SSKM Accuracies: All 0.977 | Old 0.955 | New 1.0\n"
        "iter: 1\n"
        "Accuracies: All 0.98 | Old 0.96 | New 1.0\n"
        "ACC/sACC_avg/sACC_all: All 98.0/54.0/52.0 \n"
        "ACC/Soft sACC: All 98.0/77.5\n"
        "Epoch 0: loss 1.5000 | acc 0.6000\n"
        "Epoch 1: loss 1.2000 | acc 0.7000\n"
        "IoU: 0.41\n")
    p = parse_run_log(str(log))
    assert p["hparams"]["dataset_name"] == "cub"
    assert p["hparams"]["lr"] == 0.1 and p["hparams"]["n_cluster"] == 100
    assert [a["tag"] for a in p["accs"]] == ["SSKM", ""]
    assert p["accs"][-1]["all"] == 0.98
    assert p["sacc"][0]["avg"] == 54.0
    assert p["soft_sacc"][0]["soft"] == 77.5
    assert p["epochs"][1] == {"epoch": 1, "loss": 1.2, "acc": 0.7}
    assert p["iou"] == 0.41

    rows = summarize_runs([str(log)])
    assert rows[0]["all"] == 0.98 and rows[0]["iou"] == 0.41
