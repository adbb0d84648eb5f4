"""Multi-host (multi-controller) execution: N separate processes, one
global mesh (the TPU-pod model).  The smoke launcher spawns 2 workers x 4
virtual CPU devices; every worker must print the SAME digest (the shared
SPMD program replicates results to each host exactly), and the result
must agree with a single-process run over the identical 8-device mesh and
global data up to collective reduction order — cross-process Gloo sums
reassociate floats, which can flip a k-means++ cumsum draw, so the
contract is inertia within 1e-3 relative and an (assignment-invariant)
near-perfect partition agreement, not bit equality."""

import subprocess
import sys

import numpy as np


def test_multihost_smoke_matches_single_process(tmp_path):
    import jax
    from sklearn.metrics import adjusted_rand_score

    from scripts.multihost_smoke import global_blobs
    from scd_tpu.core.config import ClusterConfig, MeshConfig
    from scd_tpu.core.mesh import make_mesh
    from scd_tpu.cluster import fit_kmeans

    # ground truth: single process over the suite's 8 virtual devices
    x, _y = global_blobs()
    res = fit_kmeans(jax.random.PRNGKey(0), x,
                     ClusterConfig(n_clusters=5, n_init=4,
                                   max_iterations=25),
                     mesh=make_mesh(MeshConfig(data=0, model=1)))

    proc = subprocess.run(
        [sys.executable, "scripts/multihost_smoke.py", "--launch", "2",
         "--devices_per_proc", "4", "--dump_dir", str(tmp_path)],
        capture_output=True, text=True, timeout=540, cwd=".")
    # the launcher exits 0 only when every worker printed the SAME digest
    assert proc.returncode == 0, proc.stderr[-2000:] + proc.stdout[-500:]

    fields = proc.stdout.split("MULTIHOST ")[1].split()
    inertia = float(fields[0])
    np.testing.assert_allclose(inertia, res.inertia, rtol=1e-3)
    mh_labels = np.load(tmp_path / "labels_0.npy")
    assert mh_labels.shape == res.labels.shape
    assert adjusted_rand_score(res.labels, mh_labels) > 0.99

    # SSKM under the same contract: labelled side inputs replicate, the
    # unlabelled rows shard per process
    from scd_tpu.cluster import fit_sskm

    xl, yl = global_blobs(n_global=80, seed=3)
    res_sskm = fit_sskm(jax.random.PRNGKey(4), x, xl, yl,
                        ClusterConfig(n_clusters=5, n_init=2,
                                      max_iterations=15),
                        mesh=make_mesh(MeshConfig(data=0, model=1)))
    sskm_inertia = float(fields[fields.index("sskm") + 1])
    np.testing.assert_allclose(sskm_inertia, res_sskm.inertia, rtol=1e-3)
    mh_sskm = np.load(tmp_path / "labels_sskm_0.npy")
    assert mh_sskm.shape == res_sskm.labels.shape
    assert adjusted_rand_score(res_sskm.labels, mh_sskm) > 0.99

    # composed encoder stage: dp encode has NO collectives, so the
    # multihost features must match a single-process encode of the same
    # images/weights (crc over 1e-4-rounded values, the digest contract)
    import zlib

    import jax.numpy as jnp

    from scd_tpu.models.vit import ViTConfig, VisionTransformer
    from scd_tpu.pipelines.common import make_sharded_image_encoder

    vcfg = ViTConfig(image_size=16, patch_size=8, width=32, depth=2,
                     heads=4)
    model = VisionTransformer(vcfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1),
                                    jnp.zeros((1, 16, 16, 3), jnp.float32))
    enc = make_sharded_image_encoder(
        lambda v, im: model.apply(v, im), variables,
        make_mesh(MeshConfig(data=0, model=1)))
    g_imgs = np.random.default_rng(7).standard_normal(
        (64, 16, 16, 3)).astype(np.float32)
    want_crc = f"{zlib.crc32(np.round(enc(g_imgs), 4).tobytes()):08x}"
    assert fields[fields.index("feats") + 1] == want_crc

    # composed naming stage: single-process rerun of the same
    # encode -> kmeans -> vocabulary top-k -> voting flow must land on
    # the same name set and (up to collective reduction order upstream)
    # the same per-image name predictions
    from scd_tpu.core.config import NamingConfig
    from scd_tpu.naming.loop import voting_loop

    feats = enc(g_imgs)
    res_enc_km = fit_kmeans(jax.random.PRNGKey(2), feats,
                            ClusterConfig(n_clusters=3, n_init=2,
                                          max_iterations=10),
                            mesh=make_mesh(MeshConfig(data=0, model=1)))
    n_vocab = 24
    zw = np.random.default_rng(11).standard_normal(
        (feats.shape[1], n_vocab)).astype(np.float32)
    zw /= np.linalg.norm(zw, axis=0, keepdims=True)
    logits = feats @ zw
    # stable sort = lax.top_k's lowest-index-first tie order
    tidx = np.argsort(-logits, axis=1, kind="stable")[:, :5].astype(np.int32)
    nouns = [f"name_{i}" for i in range(n_vocab)]
    want_vote = voting_loop(
        nouns, tidx, feats, zw, res_enc_km.labels, 3,
        NamingConfig(topk=5, num_common_vote=8, num_common_linear=4,
                     max_vote_iters=6))
    got_names = (tmp_path / "vote_names_0.txt").read_text().splitlines()
    assert set(got_names) == set(want_vote.cand_names)
    got_preds = np.load(tmp_path / "vote_preds_0.npy")
    assert adjusted_rand_score(want_vote.u_preds, got_preds) > 0.99

    # pod vocabulary build: per-shard encode + per-name reduce have no
    # cross-shard collectives, so the multihost [D, V] matrix matches the
    # single-process build numerically
    from scripts.multihost_smoke import _toy_text_encoder
    from scd_tpu.naming.zeroshot import build_zeroshot_weights

    fwd, tok, tvars = _toy_text_encoder()

    def encode_text(texts):
        import jax.numpy as jnp

        return np.asarray(fwd(tvars, jnp.asarray(tok(texts))))

    encode_text.forward = fwd
    encode_text.variables = tvars
    encode_text.tokenize = tok
    want_zw = build_zeroshot_weights(
        encode_text, [f"word {i}" for i in range(37)],
        ["a photo of a {}.", "art of the {}."], names_per_batch=16,
        mesh=make_mesh(MeshConfig(data=0, model=1)))
    got_zw = np.load(tmp_path / "zw_0.npy")
    np.testing.assert_allclose(got_zw, want_zw, atol=1e-6)

    # ragged shards: the per-process pads must be invisible — the pod's
    # encode of 2x27 rows (27 % 4 != 0) is bitwise the single-process
    # encode of the same 54 images (crc over rounded values)
    g_rag = np.random.default_rng(21).standard_normal(
        (54, 16, 16, 3)).astype(np.float32)
    want_rag = f"{zlib.crc32(np.round(enc(g_rag), 4).tobytes()):08x}"
    assert fields[fields.index("ragenc") + 1] == want_rag


import pytest


def test_multihost_gcd_train_matches_single_process():
    """GCD train steps across 2 processes (tp params via put_global,
    per-process batch shards via stage_pod_batch): the loss trajectory
    must agree across hosts exactly (the digest contract) and match a
    single-process run of the identical global batches up to collective
    reduction order."""
    import jax
    import jax.numpy as jnp

    from scripts.multihost_smoke import make_train_batches
    from scd_tpu.core.config import MeshConfig, TrainConfig
    from scd_tpu.core.mesh import make_mesh
    from scd_tpu.models.vit import ViTConfig
    from scd_tpu.train.gcd import make_gcd_state

    proc = subprocess.run(
        [sys.executable, "scripts/multihost_smoke.py", "--launch", "2",
         "--devices_per_proc", "4", "--pipeline", "train"],
        capture_output=True, text=True, timeout=540, cwd=".")
    assert proc.returncode == 0, proc.stderr[-2000:] + proc.stdout[-500:]
    fields = proc.stdout.split("TRAIN ")[1].split("'")[0].split()
    got = [float(v) for v in fields[:fields.index("uno")]]

    mesh = make_mesh(MeshConfig(data=0, model=2))
    vit_cfg = ViTConfig(image_size=16, patch_size=8, width=32, depth=2,
                        heads=4)
    cfg = TrainConfig(lr=0.05, n_views=2, proj_dim=32, grad_from_block=1,
                      batch_size=16)
    params, opt_state, step = make_gcd_state(
        vit_cfg, cfg, jax.random.PRNGKey(0), total_steps=10, mesh=mesh)
    want = []
    for batch in make_train_batches(n_views=cfg.n_views):
        params, opt_state, metrics = step(
            params, opt_state, {k: jnp.asarray(v) for k, v in batch.items()})
        want.append(float(metrics["loss"]))
    np.testing.assert_allclose(got, want, rtol=2e-3)

    # UNO v2 e2e on the same rig: single-process rerun of the identical
    # data/config must match the per-epoch loss trajectory
    from scripts.multihost_smoke import _uno_fixture
    from scd_tpu.train.baselines_e2e import train_uno_e2e

    views, u_labels, u_mask = _uno_fixture()
    _state, predict, hist = train_uno_e2e(
        jax.random.PRNGKey(1), views, u_labels, u_mask, 2, 2, vit_cfg,
        num_heads=2, epochs=2, batch_size=16, lr=0.05, warmup_epochs=1,
        seed=3, mesh=mesh)
    uno_got = [float(fields[fields.index("uno") + 1]),
               float(fields[fields.index("uno") + 2])]
    np.testing.assert_allclose(
        uno_got, [hist[0]["loss"], hist[-1]["loss"]], rtol=2e-3)

    # AutoNovel e2e on the same rig
    from scd_tpu.train.baselines_e2e import train_autonovel_e2e

    _s2, _p2, hist_an = train_autonovel_e2e(
        jax.random.PRNGKey(2), views[0], views[1], u_labels, u_mask, 2, 2,
        vit_cfg, epochs=2, batch_size=16, lr=0.05, seed=3, mesh=mesh)
    an_got = [float(fields[fields.index("an") + 1]),
              float(fields[fields.index("an") + 2])]
    np.testing.assert_allclose(
        an_got, [hist_an[0]["loss"], hist_an[-1]["loss"]], rtol=2e-3)


@pytest.mark.parametrize("kind", ["unsup", "ptsup"])
def test_multihost_full_pipeline_matches_single_process(tmp_path, capsys,
                                                        kind):
    """An ENTIRE pipeline (synthetic) under the 2-process rig: extraction
    decodes per-process dataset shards (``extract_features_pod``),
    clustering shards rows over the pod, naming/metrics replicate.  Every
    worker must print the same PIPELINE digest, and the result must match
    a single-process run of the identical config (metrics within
    collective reduction-order tolerance)."""
    from scd_tpu.core.config import (ClusterConfig, DataConfig,
                                     FeatureConfig, MeshConfig,
                                     NamingConfig, PipelineConfig)

    proc = subprocess.run(
        [sys.executable, "scripts/multihost_smoke.py", "--launch", "2",
         "--devices_per_proc", "4", "--pipeline", kind,
         "--dump_dir", str(tmp_path)],
        capture_output=True, text=True, timeout=540, cwd=".")
    assert proc.returncode == 0, proc.stderr[-2000:] + proc.stdout[-500:]
    fields = proc.stdout.split("PIPELINE ")[1].split()

    cfg = PipelineConfig(
        data=DataConfig(dataset_name="synthetic",
                        cache_dir=str(tmp_path / "single")),
        feature=FeatureConfig(feat_model="synthetic"),
        cluster=ClusterConfig(algorithm="SSKM", n_clusters=10, n_init=3,
                              max_iterations=20),
        naming=NamingConfig(corpus="synthetic", topk=5, num_common_vote=5,
                            num_common_linear=3),
        mesh=MeshConfig(data=0, model=1),
    )
    if kind == "unsup":
        from scd_tpu.pipelines.unsup import run_unsup

        res = run_unsup(cfg)
        accs = [float(v)
                for v in fields[fields.index("acc") + 1].split("/")]
        np.testing.assert_allclose(accs, res["cluster_acc"], atol=0.02)
        np.testing.assert_allclose(
            float(fields[fields.index("iou") + 1]), res["iou"], atol=0.05)
        np.testing.assert_allclose(
            float(fields[fields.index("sacc") + 1]),
            res["history"][-1]["sacc_all_All"], atol=0.02)
    else:
        from scd_tpu.pipelines.ptsup import run_ptsup

        res = run_ptsup(cfg)
        np.testing.assert_allclose(
            float(fields[fields.index("acc") + 1]),
            res["cluster_acc"][0], atol=0.02)
        np.testing.assert_allclose(
            float(fields[fields.index("lb") + 1]),
            res["bounds"]["lb"][0], atol=0.5)
        np.testing.assert_allclose(
            float(fields[fields.index("ub") + 1]),
            res["bounds"]["ub"][0], atol=0.5)
