"""End-to-end pipeline tests on the synthetic dataset (no assets needed).
This is the 'minimum end-to-end slice' (SURVEY §7): features -> clustering ->
voting loop -> ACC/sACC printouts."""

import numpy as np
import pytest

from scd_tpu.core.config import (
    ClusterConfig,
    DataConfig,
    FeatureConfig,
    NamingConfig,
    PipelineConfig,
)


def make_cfg(tmp_path, **cluster_kw):
    ckw = dict(algorithm="SSKM", n_clusters=10, n_init=3, max_iterations=20)
    ckw.update(cluster_kw)
    return PipelineConfig(
        data=DataConfig(dataset_name="synthetic", cache_dir=str(tmp_path)),
        feature=FeatureConfig(feat_model="synthetic"),
        cluster=ClusterConfig(**ckw),
        naming=NamingConfig(corpus="synthetic", topk=5, num_common_vote=5,
                            num_common_linear=3),
    )


def test_unsup_pipeline_synthetic(tmp_path, capsys):
    from scd_tpu.pipelines.unsup import run_unsup

    res = run_unsup(make_cfg(tmp_path))
    all_acc, old_acc, new_acc = res["cluster_acc"]
    assert all_acc > 0.9
    assert res["iou"] > 0.8
    # final sACC from the last voting iteration
    assert res["history"][-1]["sacc_all_All"] > 0.9
    out = capsys.readouterr().out
    assert "Accuracies: All" in out and "ACC/sACC_avg/sACC_all" in out
    assert "IoU:" in out


def test_unsup_pipeline_cache_reentry(tmp_path):
    from scd_tpu.pipelines.unsup import run_unsup

    cfg = make_cfg(tmp_path)
    res1 = run_unsup(cfg)
    # second run re-enters from cached features + clusters
    res2 = run_unsup(cfg)
    assert res1["cluster_acc"] == res2["cluster_acc"]
    np.testing.assert_array_equal(res1["voting"].u_preds, res2["voting"].u_preds)


def test_unsup_pipeline_km(tmp_path):
    from scd_tpu.pipelines.unsup import run_unsup

    res = run_unsup(make_cfg(tmp_path, algorithm="KM"))
    assert res["cluster_acc"][0] > 0.85


def test_unsup_pipeline_consskm(tmp_path):
    from scd_tpu.pipelines.unsup import run_unsup

    res = run_unsup(make_cfg(tmp_path, algorithm="ConSSKM", size_min=5,
                             size_max=40))
    assert res["cluster_acc"][0] > 0.85


def _metric_lines(out: str):
    """The user-facing metric printout lines (the reference's stdout
    contract): ACC/sACC blocks, Accuracies, IoU."""
    return [ln for ln in out.splitlines()
            if ln.startswith(("Accuracies:", "ACC/", "IoU:"))]


def test_unsup_pipeline_mesh_matches_single_device(tmp_path, monkeypatch,
                                                   capsys):
    """Composed full-pipeline mesh parity (VERDICT r3 item 4): the entire
    unsup pipeline (extraction -> SSKM -> top-k -> voting -> metrics) on
    the 8-device CPU mesh must print the same metrics as the single-device
    run.  The piecewise stages have bit-parity tests
    (test_sharded_extract, test_multichip_cluster); this locks the
    composition."""
    from scd_tpu.pipelines import common
    from scd_tpu.pipelines.unsup import run_unsup

    # run 1: force the single-device path (fresh cache dir)
    monkeypatch.setattr(common, "_pipeline_mesh", lambda c: None)
    res_single = run_unsup(make_cfg(tmp_path / "single"))
    out_single = capsys.readouterr().out
    monkeypatch.undo()

    # run 2: the mesh path, with a spy asserting it actually engaged
    real = common._pipeline_mesh
    seen = []

    def spy(c):
        m = real(c)
        seen.append(m)
        return m

    monkeypatch.setattr(common, "_pipeline_mesh", spy)
    res_mesh = run_unsup(make_cfg(tmp_path / "mesh"))
    out_mesh = capsys.readouterr().out
    assert seen and all(m is not None for m in seen), \
        "mesh path never engaged — parity test is vacuous"

    assert res_mesh["cluster_acc"] == res_single["cluster_acc"]
    np.testing.assert_array_equal(res_mesh["voting"].u_preds,
                                  res_single["voting"].u_preds)
    assert res_mesh["voting"].cand_names == res_single["voting"].cand_names
    assert res_mesh["iou"] == res_single["iou"]
    assert _metric_lines(out_mesh) == _metric_lines(out_single)


def test_ptsup_pipeline_mesh_matches_single_device(tmp_path, monkeypatch,
                                                   capsys):
    """Same composed-parity lock for the partially-supervised pipeline:
    mesh run == single-device run on bounds, candidates, and printouts."""
    from scd_tpu.pipelines import common
    from scd_tpu.pipelines.ptsup import run_ptsup

    monkeypatch.setattr(common, "_pipeline_mesh", lambda c: None)
    res_single = run_ptsup(make_cfg(tmp_path / "single"))
    out_single = capsys.readouterr().out
    monkeypatch.undo()

    real = common._pipeline_mesh
    seen = []

    def spy(c):
        m = real(c)
        seen.append(m)
        return m

    monkeypatch.setattr(common, "_pipeline_mesh", spy)
    res_mesh = run_ptsup(make_cfg(tmp_path / "mesh"))
    out_mesh = capsys.readouterr().out
    assert seen and all(m is not None for m in seen)

    assert res_mesh["bounds"] == res_single["bounds"]
    assert res_mesh["voting"].cand_names == res_single["voting"].cand_names
    np.testing.assert_array_equal(res_mesh["voting"].u_preds,
                                  res_single["voting"].u_preds)
    assert res_mesh["iou"] == res_single["iou"]
    assert _metric_lines(out_mesh) == _metric_lines(out_single)


def test_ptsup_pipeline_synthetic(tmp_path, capsys):
    from scd_tpu.pipelines.ptsup import run_ptsup

    res = run_ptsup(make_cfg(tmp_path))
    out = capsys.readouterr().out
    assert "sACC lower bound" in out and "sACC upper bound" in out
    lb_all = res["bounds"]["lb"][0]
    ub_all = res["bounds"]["ub"][0]
    assert ub_all >= lb_all  # restricting the vocab can only help
    assert ub_all > 90
    # Soft-sACC LB/UB block (main_ptsup.py:564-585): both bounds printed,
    # plus the UB "clip ACC" v2 line
    assert "Soft sACC lower bound" in out
    assert "Soft sACC upper bound" in out
    assert "clip ACC: All" in out
    sb = res["soft_bounds"]
    assert sb is not None
    assert 0.0 <= sb["soft_lb"][0] <= 1.0
    assert sb["soft_ub"][0] >= sb["soft_lb"][0]
    assert sb["clip_acc"][0] > 0.9  # synthetic zero-shot is near-perfect
    # labelled names must be pinned in the final candidates
    gt_names = list(res["cidx_to_cname"].values())
    assert set(gt_names[:5]) <= set(res["voting"].cand_names)
    assert res["iou"] > 0.8


def test_pipeline_cli_args():
    from scd_tpu.pipelines.unsup import build_argparser, config_from_args

    args = build_argparser().parse_args(
        ["--dataset_name", "synthetic", "--cluster", "KM",
         "--n_cluster", "7", "--topk", "3"])
    cfg = config_from_args(args)
    assert cfg.cluster.algorithm == "KM"
    assert cfg.cluster.n_clusters == 7
    assert cfg.naming.topk == 3


def test_zero_shot_preds_streaming_matches_dense():
    """Chunked classify_topk(k=1) path == dense argmax, including the padded
    ragged final chunk (batch=1024 over N=2500)."""
    import numpy as np

    from scd_tpu.pipelines.ptsup import zero_shot_preds

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2500, 64)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    w = rng.standard_normal((64, 512)).astype(np.float32)
    w /= np.linalg.norm(w, axis=0, keepdims=True)

    preds = zero_shot_preds(feats, w, batch=1024)
    dense = np.argmax(feats @ w, axis=1)
    assert preds.shape == (2500,)
    np.testing.assert_array_equal(preds, dense)


def test_soft_sacc_bounds_block(capsys):
    """soft_sacc_bounds reproduces the reference block semantics on a
    hand-built fixture: a perfectly-separable embedding gives UB soft-sACC 1
    and clip ACC 1; LB is pulled down by distractor nouns."""
    import numpy as np

    from scd_tpu.pipelines.ptsup import soft_sacc_bounds

    # 3 classes with orthogonal CLIP features
    d = 8
    cls_vecs = np.eye(3, d, dtype=np.float32)
    u_targets = np.repeat(np.arange(3), 10)
    clip_u = cls_vecs[u_targets]
    mask = u_targets < 2  # classes 0,1 old; 2 new
    cidx_to_cname = {0: "cat", 1: "dog", 2: "fox"}
    # vocab: the 3 GT names + a distractor that shadows class 2
    nouns = ["cat", "dog", "fox", "wolf"]
    zw = np.zeros((d, 4), np.float32)
    zw[0, 0] = 1.0  # cat
    zw[1, 1] = 1.0  # dog
    zw[2, 2] = 0.5  # fox (weak)
    zw[2, 3] = 1.0  # wolf shadows fox in the full vocab
    sim = lambda a, b: 1.0 if a == b else 0.1

    out = soft_sacc_bounds(clip_u, u_targets, mask, cidx_to_cname, nouns, zw,
                           sim)
    printed = capsys.readouterr().out
    assert "Soft sACC lower bound" in printed
    assert "Soft sACC upper bound" in printed
    assert "clip ACC: All" in printed
    # UB: restricted vocab -> all correct
    assert out["clip_acc"] == (1.0, 1.0, 1.0)
    assert out["soft_ub"][0] == 1.0
    # LB: class 2 goes to "wolf" (sim 0.1), so overall = (20 + 10*0.1)/30
    np.testing.assert_allclose(out["soft_lb"][0], 21.0 / 30.0)
    # the "new" subset is all-wolf: per-subset batch-max normalization (a
    # reference quirk we reproduce) rescales 0.1/0.1 -> 1.0
    np.testing.assert_allclose(out["soft_lb"][2], 1.0)


def test_infer_serving_path():
    """Serving entry point: NameClassifier + classifier_from_run slice the
    converged candidate columns and classify new images to names."""
    from scd_tpu.core.config import DataConfig
    from scd_tpu.data import get_datasets
    from scd_tpu.models.synthetic import SyntheticCLIP
    from scd_tpu.naming.zeroshot import build_zeroshot_weights
    from scd_tpu.pipelines.infer import NameClassifier, classifier_from_run

    dcfg = DataConfig(dataset_name="synthetic")
    _m, test_ds, _u, extras = get_datasets(dcfg)
    clip = SyntheticCLIP(extras["class_colors"])
    names = sorted(extras["class_colors"])
    # full "vocabulary" = class names + distractors; serve a subset
    nouns = names + [f"distractor_{i}" for i in range(7)]
    zw = build_zeroshot_weights(clip.encode_text, nouns, ["{}"])
    clf = classifier_from_run(clip.encode_image, zw, nouns,
                              cand_names=names)
    imgs = np.stack([np.asarray(test_ds[i][0]) for i in range(12)])
    truth = [names[int(test_ds[i][1])] for i in range(12)]
    named, probs = clf.classify(imgs, topk=1)
    assert np.mean([t == row[0] for t, row in zip(truth, named)]) > 0.9
    assert probs.shape == (12, 1) and (probs <= 1.0).all()

    with np.testing.assert_raises(KeyError):
        classifier_from_run(clip.encode_image, zw, nouns, ["not_a_name"])
    with np.testing.assert_raises(ValueError):
        NameClassifier(clip.encode_image, zw[:, :3], names)


def test_infer_cli(capsys):
    from scd_tpu.pipelines.infer import main as infer_main

    acc = infer_main(["--dataset_name", "synthetic", "--topk", "1"])
    assert acc == 1.0


def _tiny_clip_config():
    from scd_tpu.models.clip import CLIPConfig
    from scd_tpu.models.vit import ViTConfig

    return CLIPConfig(
        vision=ViTConfig(image_size=32, patch_size=8, width=32, depth=2,
                         heads=2, quick_gelu=True, pre_post_norm=True,
                         output_proj=16, patch_bias=False),
        vocab_size=128, context_length=16, text_width=32, text_depth=1,
        text_heads=2, embed_dim=16)


def _write_images(root, layout):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for sub, count in layout:
        d = root / sub if sub else root
        d.mkdir(parents=True, exist_ok=True)
        for i in range(count):
            p = d / f"img_{i}.png"
            Image.fromarray(rng.integers(0, 255, (40, 56, 3), np.uint8),
                            "RGB").save(p)
            paths.append(p)
    return paths


def test_infer_cli_directory_mesh(tmp_path, monkeypatch, capsys):
    """Non-synthetic serving branch end-to-end with fabricated weights
    (VERDICT r3 item 8): a directory of images (imagefolder layout) flows
    through the threaded loader -> mesh dp-sharded CLIP encode -> fused
    classify, one printed line per image with names from --names."""
    import scd_tpu.models as models
    import scd_tpu.pipelines.common as common
    from scd_tpu.pipelines.infer import main as infer_main

    monkeypatch.setattr(models, "clip_vit_b16_config",
                        lambda compute_dtype=None: _tiny_clip_config())
    real_mk = common.make_sharded_image_encoder
    sharded = []

    def spy(*a, **k):
        enc = real_mk(*a, **k)
        sharded.append(enc)
        return enc

    monkeypatch.setattr(common, "make_sharded_image_encoder", spy)

    _write_images(tmp_path / "imgs", [("clsA", 5), ("clsB", 4)])
    rng = np.random.default_rng(1)
    zw = rng.standard_normal((16, 3)).astype(np.float32)
    zw /= np.linalg.norm(zw, axis=0, keepdims=True)
    np.save(tmp_path / "zw.npy", zw)
    (tmp_path / "names.txt").write_text("cat\ndog\nfox\n")

    count = infer_main([
        "--dataset_name", "real", "--clip_weights", "random",
        "--zeroshot_weights", str(tmp_path / "zw.npy"),
        "--names", str(tmp_path / "names.txt"),
        "--images", str(tmp_path / "imgs"),
        "--batch_size", "4", "--image_size", "32", "--topk", "2"])
    assert count == 9
    assert sharded, "mesh dp path never engaged (8 devices visible)"
    rows = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("[")]
    assert len(rows) == 9
    for row in rows:
        named = eval(row.split("\t")[0])  # ['name', 'name']
        assert len(named) == 2 and set(named) <= {"cat", "dog", "fox"}


def test_iter_image_batches_sources(tmp_path):
    """--images source handling: flat directory, imagefolder, .npy — all
    yield fixed-shape batches with correct n_valid and zero-padded tails."""
    from scd_tpu.pipelines.infer import iter_image_batches

    # flat directory (no class subdirs), 5 images, batch 2 -> 2+2+1
    _write_images(tmp_path / "flat", [("", 5)])
    got = list(iter_image_batches(str(tmp_path / "flat"), 2, image_size=16))
    assert [n for _b, n in got] == [2, 2, 1]
    assert all(b.shape == (2, 16, 16, 3) for b, _n in got)
    assert got[-1][0][1].sum() == 0  # padded row is zeros

    # MIXED directory: flat files + a stray subdir — the UNION is served
    # (a .thumbnails/-style subdir must not silently drop the flat images)
    _write_images(tmp_path / "mixed", [("", 4), ("stray", 2)])
    got = list(iter_image_batches(str(tmp_path / "mixed"), 4,
                                  image_size=16))
    assert sum(n for _b, n in got) == 6

    # .npy array source, ragged tail
    arr = np.arange(3 * 4 * 4 * 3, dtype=np.float32).reshape(3, 4, 4, 3)
    np.save(tmp_path / "batch.npy", arr)
    got = list(iter_image_batches(str(tmp_path / "batch.npy"), 2))
    assert [n for _b, n in got] == [2, 1]
    np.testing.assert_array_equal(got[1][0][0], arr[2])
    assert got[1][0][1].sum() == 0

    # .npz: documented 'images' key AND the np.savez positional default
    np.savez(tmp_path / "b1.npz", images=arr)
    np.savez(tmp_path / "b2.npz", arr)  # stored as arr_0
    for f in ("b1.npz", "b2.npz"):
        got = list(iter_image_batches(str(tmp_path / f), 2))
        assert sum(n for _b, n in got) == 3, f

    with pytest.raises(SystemExit):
        empty = tmp_path / "empty"
        empty.mkdir()
        list(iter_image_batches(str(empty), 2))
