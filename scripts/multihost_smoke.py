"""Multi-host (multi-controller) smoke: N processes x M virtual CPU
devices run the SAME program over one global mesh, each feeding its own
row shard — the TPU-pod execution model (SURVEY §2.10 note: the reference
has no distributed runtime at all; this validates ours end-to-end).

Launcher (spawns the workers locally, compares their digests):

    python scripts/multihost_smoke.py --launch 2 --devices_per_proc 4

Worker (one per host on a real pod; jax.distributed auto-detects there):

    python scripts/multihost_smoke.py --coordinator 127.0.0.1:1234 \
        --num_processes 2 --process_id 0

Each worker builds the global (data x model) mesh over ALL devices,
assembles the globally-sharded feature matrix from its local rows
(`rows_from_process_local`), runs the mesh `fit_kmeans`, and prints one
digest line `MULTIHOST <inertia> <labels-crc>`.  The launcher asserts all
workers print the SAME digest (results replicate to every host) and exits
0 only then.  `tests/test_multihost.py` additionally checks agreement
with a single-process ground-truth run on the identical global data —
inertia to 1e-3 relative and near-perfect partition ARI (cross-process
collectives reassociate float sums, so bit equality is not the contract).
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
import zlib

import numpy as np


def _toy_text_encoder():
    """Deterministic jittable stand-in for the CLIP text tower (the
    fixture pattern of ``tests/test_naming.py``): token-embedding mean +
    a hash tokenizer.  Returns (forward, tokenize, variables)."""
    import jax.numpy as jnp

    d, seq = 16, 8
    emb = np.random.default_rng(13).standard_normal((997, d)).astype(
        np.float32)

    def forward(variables, tokens):
        return jnp.mean(variables["emb"][tokens], axis=1)

    def tokenize(texts):
        out = np.zeros((len(texts), seq), np.int32)
        for i, t in enumerate(texts):
            h = [ord(c) for c in t][:seq]
            out[i, :len(h)] = np.array(h, np.int32) % 997
        return out

    return forward, tokenize, {"emb": jnp.asarray(emb)}


def global_blobs(n_global: int = 256, d: int = 16, k: int = 5,
                 seed: int = 0) -> tuple:
    """Deterministic global dataset every process can regenerate."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, d)).astype(np.float32) * 6
    labels = np.arange(n_global) % k
    x = centers[labels] + rng.standard_normal((n_global, d)).astype(np.float32)
    return x, labels


def pipeline_worker(dump_dir: str, kind: str = "unsup") -> str:
    """Run an ENTIRE pipeline (synthetic dataset) under the
    multi-controller rig: extraction decodes only this process's dataset
    shard (``extract_features_pod``), clustering shards the unlabelled
    rows over the pod (``_pod_shard`` -> mesh fitters), vocabulary/top-k/
    voting/metrics replicate.  ``kind``: unsup | ptsup (the latter adds
    the UB/LB bound evaluators and pinned labelled names).  Prints one
    PIPELINE digest line every process must agree on."""
    import jax

    from scd_tpu.core.config import (ClusterConfig, DataConfig,
                                     FeatureConfig, MeshConfig,
                                     NamingConfig, PipelineConfig)

    cache = os.path.join(dump_dir or "/tmp/scd_mh",
                         f"cache_{kind}_p{jax.process_index()}")
    cfg = PipelineConfig(
        data=DataConfig(dataset_name="synthetic", cache_dir=cache),
        feature=FeatureConfig(feat_model="synthetic"),
        cluster=ClusterConfig(algorithm="SSKM", n_clusters=10, n_init=3,
                              max_iterations=20),
        naming=NamingConfig(corpus="synthetic", topk=5, num_common_vote=5,
                            num_common_linear=3),
        mesh=MeshConfig(data=0, model=1),
    )
    if kind == "ptsup":
        from scd_tpu.pipelines.ptsup import run_ptsup

        res = run_ptsup(cfg)
        vote = res["voting"]
        digest = ("PIPELINE "
                  f"acc {res['cluster_acc'][0]:.4f} "
                  f"lb {res['bounds']['lb'][0]:.4f} "
                  f"ub {res['bounds']['ub'][0]:.4f} "
                  f"names {zlib.crc32(','.join(vote.cand_names).encode()):08x} "
                  f"preds {zlib.crc32(np.asarray(vote.u_preds, np.int32).tobytes()):08x}")
    else:
        from scd_tpu.pipelines.unsup import run_unsup

        res = run_unsup(cfg)
        all_acc, old_acc, new_acc = res["cluster_acc"]
        digest = ("PIPELINE "
                  f"acc {all_acc:.4f}/{old_acc:.4f}/{new_acc:.4f} "
                  f"iou {res['iou']:.4f} "
                  f"sacc {res['history'][-1]['sacc_all_All']:.4f} "
                  f"names {zlib.crc32(','.join(res['voting'].cand_names).encode()):08x} "
                  f"preds {zlib.crc32(np.asarray(res['voting'].u_preds, np.int32).tobytes()):08x}")
    print(digest, flush=True)
    return digest


def _uno_fixture(n: int = 32, n_cls: int = 4):
    """Deterministic UNO-e2e data every process regenerates identically."""
    rng = np.random.default_rng(5)
    imgs = rng.standard_normal((n, 16, 16, 3)).astype(np.float32)
    views = np.stack([imgs, imgs + 0.01 * rng.standard_normal(
        imgs.shape).astype(np.float32)])
    u_labels = (np.arange(n) % n_cls).astype(np.int64)
    u_mask = np.arange(n) % 2 == 0
    return views, u_labels, u_mask


def make_train_batches(n_steps: int = 3, b_global: int = 16,
                       n_views: int = 2, size: int = 16, seed: int = 9):
    """Deterministic global GCD train batches every process regenerates."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_steps):
        out.append({
            "images": rng.standard_normal(
                (n_views * b_global, size, size, 3)).astype(np.float32),
            "labels": rng.integers(0, 4, b_global).astype(np.int32),
            "mask_lab": (rng.random(b_global) < 0.5),
        })
    return out


def train_worker(num_processes: int, process_id: int) -> str:
    """GCD training steps under the multi-controller rig: tensor-parallel
    params materialize per host (put_global), each process feeds its
    batch shard (stage_pod_batch), the InfoNCE/SupCon global-batch
    semantics ride GSPMD collectives.  Prints a TRAIN digest of the loss
    trajectory every process must agree on."""
    import jax

    from scd_tpu.core.config import MeshConfig, TrainConfig
    from scd_tpu.core.mesh import make_mesh
    from scd_tpu.core.multihost import host_fetch
    from scd_tpu.models.vit import ViTConfig
    from scd_tpu.train.gcd import make_gcd_state, stage_pod_batch

    mesh = make_mesh(MeshConfig(data=0, model=2))
    vit_cfg = ViTConfig(image_size=16, patch_size=8, width=32, depth=2,
                        heads=4)
    cfg = TrainConfig(lr=0.05, n_views=2, proj_dim=32, grad_from_block=1,
                      batch_size=16)
    params, opt_state, step = make_gcd_state(
        vit_cfg, cfg, jax.random.PRNGKey(0), total_steps=10, mesh=mesh)

    losses = []
    n_views = cfg.n_views
    for batch in make_train_batches(n_views=n_views):
        bl = len(batch["labels"]) // num_processes
        lo = process_id * bl
        local = {
            "images": np.concatenate([
                batch["images"][v * len(batch["labels"]) + lo:
                                v * len(batch["labels"]) + lo + bl]
                for v in range(n_views)]),
            "labels": batch["labels"][lo:lo + bl],
            "mask_lab": batch["mask_lab"][lo:lo + bl],
        }
        params, opt_state, metrics = step(
            params, opt_state, stage_pod_batch(mesh, local, n_views))
        losses.append(float(host_fetch(metrics["loss"])))
    digest = "TRAIN " + " ".join(f"{v:.5f}" for v in losses)

    # UNO v2 e2e on the same rig: every process passes the identical full
    # arrays (the e2e trainers' in-memory contract); jit's in_shardings
    # assembles the global batch from each host's copy
    from scd_tpu.train.baselines_e2e import train_uno_e2e

    views, u_labels, u_mask = _uno_fixture()
    imgs = views[0]
    _state, predict, hist = train_uno_e2e(
        jax.random.PRNGKey(1), views, u_labels, u_mask, 2, 2, vit_cfg,
        num_heads=2, epochs=2, batch_size=16, lr=0.05, warmup_epochs=1,
        seed=3, mesh=mesh)
    preds_crc = zlib.crc32(predict(imgs).astype(np.int32).tobytes())
    digest += (f" uno {hist[0]['loss']:.5f} {hist[-1]['loss']:.5f} "
               f"{preds_crc:08x}")

    # AutoNovel e2e: same rig, same staging contract
    from scd_tpu.train.baselines_e2e import train_autonovel_e2e

    _s2, _p2, hist_an = train_autonovel_e2e(
        jax.random.PRNGKey(2), views[0], views[1], u_labels, u_mask, 2, 2,
        vit_cfg, epochs=2, batch_size=16, lr=0.05, seed=3, mesh=mesh)
    digest += f" an {hist_an[0]['loss']:.5f} {hist_an[-1]['loss']:.5f}"
    print(digest, flush=True)
    return digest


def worker(coordinator: str, num_processes: int, process_id: int,
           devices_per_proc: int, dump_dir: str = "",
           pipeline: str = "") -> str:
    # the script lives in scripts/; the package root is its parent
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in sys.path:
        sys.path.insert(0, root)
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count="
                                 f"{devices_per_proc}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from scd_tpu.core.multihost import initialize

    initialize(coordinator, num_processes, process_id)

    if pipeline == "train":
        return train_worker(num_processes, process_id)
    if pipeline:
        return pipeline_worker(dump_dir, pipeline)

    from scd_tpu.core.config import ClusterConfig, MeshConfig
    from scd_tpu.core.mesh import make_mesh
    from scd_tpu.cluster import fit_kmeans

    mesh = make_mesh(MeshConfig(data=0, model=1))  # all global devices
    x, _y = global_blobs()
    n_local = x.shape[0] // num_processes
    local = x[process_id * n_local:(process_id + 1) * n_local]

    res = fit_kmeans(jax.random.PRNGKey(0), local,
                     ClusterConfig(n_clusters=5, n_init=4,
                                   max_iterations=25),
                     mesh=mesh)

    # SSKM + constrained (sinkhorn) under the same multi-controller
    # contract: unlabelled rows shard per process, the labelled set is
    # the identical full copy on every host
    from scd_tpu.cluster import fit_constrained, fit_sskm

    xl, yl = global_blobs(n_global=80, seed=3)
    res_sskm = fit_sskm(jax.random.PRNGKey(4), local, xl, yl,
                        ClusterConfig(n_clusters=5, n_init=2,
                                      max_iterations=15), mesh=mesh)
    n_loc = local.shape[0]
    res_con = fit_constrained(
        jax.random.PRNGKey(5), local, xl, yl,
        ClusterConfig(n_clusters=5, n_init=2, max_iterations=10,
                      size_min=1, size_max=n_loc * num_processes,
                      constrained_backend="sinkhorn"), mesh=mesh)

    # composed stage: dp-sharded ViT encode of per-process image shards,
    # device-resident handoff (encode.sharded) into the mesh clusterer --
    # features never touch a host between stages
    import jax.numpy as jnp

    from scd_tpu.models.vit import ViTConfig, VisionTransformer
    from scd_tpu.pipelines.common import make_sharded_image_encoder

    vcfg = ViTConfig(image_size=16, patch_size=8, width=32, depth=2,
                     heads=4)
    model = VisionTransformer(vcfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1),
                                    jnp.zeros((1, 16, 16, 3), jnp.float32))
    enc = make_sharded_image_encoder(lambda v, im: model.apply(v, im),
                                     variables, mesh)
    g_imgs = np.random.default_rng(7).standard_normal(
        (64, 16, 16, 3)).astype(np.float32)
    n_img_local = g_imgs.shape[0] // num_processes
    local_imgs = g_imgs[process_id * n_img_local:
                        (process_id + 1) * n_img_local]
    feats_host = enc(local_imgs)  # replicated [64, D] on every host
    staged_feats, _n = enc.sharded(local_imgs)  # device handoff
    res2 = fit_kmeans(jax.random.PRNGKey(2), staged_feats,
                      ClusterConfig(n_clusters=3, n_init=2,
                                    max_iterations=10), mesh=mesh)
    # ragged shards: per-process rows NOT a multiple of the local device
    # count — encode pads+masks per process (bitwise-equal features to a
    # single-process run), and fit_kmeans masks the pads out of
    # seeding/sums and returns labels for the real rows only
    g_rag = np.random.default_rng(21).standard_normal(
        (54, 16, 16, 3)).astype(np.float32)
    n_rag = g_rag.shape[0] // num_processes  # 27 rows over 4 devices
    feats_rag = enc(g_rag[process_id * n_rag:(process_id + 1) * n_rag])
    assert feats_rag.shape[0] == n_rag * num_processes
    ragenc_crc = zlib.crc32(np.round(feats_rag, 4).tobytes())
    xr, _yr = global_blobs(n_global=60, d=16, k=4, seed=22)
    n_r = 60 // num_processes  # 30 rows over 4 devices
    res_rag = fit_kmeans(jax.random.PRNGKey(6),
                         xr[process_id * n_r:(process_id + 1) * n_r],
                         ClusterConfig(n_clusters=4, n_init=2,
                                       max_iterations=15), mesh=mesh)
    assert res_rag.labels.shape[0] == 60

    # naming stages compose on top — the full SCD flow at pod scale:
    # device top-k of every image's vocabulary logits (features stay
    # row-sharded, the [D, V] vocabulary replicates), then the voting
    # loop (Counter + Hungarian: HOST work, identical on every process
    # from the replicated top-k — the single-chip pipeline's division of
    # labor carries over unchanged)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from scd_tpu.core.config import NamingConfig
    from scd_tpu.core.multihost import host_fetch, replicate_to_mesh
    from scd_tpu.naming.loop import voting_loop

    n_vocab = 24
    dim = feats_host.shape[1]
    zw = np.random.default_rng(11).standard_normal(
        (dim, n_vocab)).astype(np.float32)
    zw /= np.linalg.norm(zw, axis=0, keepdims=True)
    rows_s = NamedSharding(mesh, P(mesh.axis_names[0]))
    repl_s = NamedSharding(mesh, P())
    topk_f = jax.jit(lambda f, w: jax.lax.top_k(f @ w, 5),
                     in_shardings=(rows_s, repl_s))
    _tvals, tidx = topk_f(staged_feats, replicate_to_mesh(mesh, zw))
    tidx_h = host_fetch(tidx).astype(np.int32)
    nouns = [f"name_{i}" for i in range(n_vocab)]
    res_vote = voting_loop(
        nouns, tidx_h, feats_host, zw, np.asarray(res2.labels), 3,
        NamingConfig(topk=5, num_common_vote=8, num_common_linear=4,
                     max_vote_iters=6))
    vote_crc = zlib.crc32(",".join(res_vote.cand_names).encode())

    # pod vocabulary build: every process feeds its slice of each token
    # batch, the text encode splits over ALL chips, the [D, V] matrix
    # returns on every host (the single-chip pipeline's longest stage)
    from scd_tpu.naming.zeroshot import build_zeroshot_weights

    fwd, tokenize, tvars = _toy_text_encoder()

    def encode_text(texts):
        return np.asarray(fwd(tvars, jnp.asarray(tokenize(texts))))

    encode_text.forward = fwd
    encode_text.variables = tvars
    encode_text.tokenize = tokenize
    zw_built = build_zeroshot_weights(
        encode_text, [f"word {i}" for i in range(37)],
        ["a photo of a {}.", "art of the {}."], names_per_batch=16,
        mesh=mesh)
    zw_crc = zlib.crc32(np.round(zw_built, 5).tobytes())

    # vocabulary-sharded top-k on a (data x model) mesh: the [D, V]
    # weights split over the model axis (which spans processes here), the
    # per-shard candidates merge and the softmax normalizer psums across
    # shards — the cross-process collective pattern of the [N, 68k]
    # naming stage
    from scd_tpu.ops.topk import classify_topk_sharded

    mesh_dm = make_mesh(MeshConfig(data=num_processes
                                   * devices_per_proc // 2, model=2))
    tvals, tidx2 = classify_topk_sharded(feats_host, zw, 4, mesh_dm)
    from scd_tpu.core.multihost import host_fetch

    topk_crc = zlib.crc32(host_fetch(tidx2).astype(np.int32).tobytes())

    feats_crc = zlib.crc32(np.round(feats_host, 4).tobytes())
    digest = (f"MULTIHOST {res.inertia:.4f} "
              f"{zlib.crc32(res.labels.astype(np.int32).tobytes()):08x} "
              f"feats {feats_crc:08x} enc_km {res2.inertia:.3f} "
              f"sskm {res_sskm.inertia:.3f} "
              f"{zlib.crc32(res_sskm.labels.astype(np.int32).tobytes()):08x} "
              f"con {res_con.inertia:.3f} "
              f"{zlib.crc32(res_con.labels.astype(np.int32).tobytes()):08x} "
              f"vote {vote_crc:08x} "
              f"{zlib.crc32(np.asarray(res_vote.u_preds, np.int32).tobytes()):08x} "
              f"zw {zw_crc:08x} topk {topk_crc:08x} "
              f"ragenc {ragenc_crc:08x} ragkm {res_rag.inertia:.3f} "
              f"{zlib.crc32(res_rag.labels.astype(np.int32).tobytes()):08x}")
    if dump_dir:
        np.save(os.path.join(dump_dir, f"labels_{process_id}.npy"),
                res.labels)
        np.save(os.path.join(dump_dir, f"labels_sskm_{process_id}.npy"),
                res_sskm.labels)
        np.save(os.path.join(dump_dir, f"vote_preds_{process_id}.npy"),
                np.asarray(res_vote.u_preds, np.int32))
        with open(os.path.join(dump_dir,
                               f"vote_names_{process_id}.txt"), "w") as f:
            f.write("\n".join(res_vote.cand_names))
        np.save(os.path.join(dump_dir, f"zw_{process_id}.npy"), zw_built)
    print(digest, flush=True)
    return digest


def launch(num_processes: int, devices_per_proc: int,
           dump_dir: str = "", pipeline: str = "") -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    procs = [
        subprocess.Popen(
            [sys.executable, __file__,
             "--coordinator", f"127.0.0.1:{port}",
             "--num_processes", str(num_processes),
             "--process_id", str(i),
             "--devices_per_proc", str(devices_per_proc),
             "--dump_dir", dump_dir]
            + (["--pipeline", pipeline] if pipeline else []),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for i in range(num_processes)]
    digests = []
    ok = True
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        lines = [ln for ln in out.splitlines()
                 if ln.startswith(("MULTIHOST", "PIPELINE", "TRAIN"))]
        if p.returncode != 0 or not lines:
            print(f"[launch] worker {i} failed (rc={p.returncode}):\n"
                  + out[-2000:], file=sys.stderr)
            ok = False
            continue
        digests.append(lines[-1])
    if ok and len(set(digests)) == 1:
        print(f"multihost smoke ok: {num_processes} processes x "
              f"{devices_per_proc} devices, digest {digests[0]!r}")
        return 0
    print(f"[launch] digest mismatch or failure: {digests}", file=sys.stderr)
    return 1


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--launch", type=int, default=0,
                   help="spawn N local workers (CPU demo mode)")
    p.add_argument("--coordinator", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--process_id", type=int, default=0)
    p.add_argument("--devices_per_proc", type=int, default=4)
    p.add_argument("--dump_dir", type=str, default="",
                   help="save each worker's labels_<pid>.npy here")
    p.add_argument("--pipeline", nargs="?", const="unsup", default="",
                   choices=["", "unsup", "ptsup", "train"],
                   help="run a FULL pipeline (synthetic) or GCD train "
                        "steps instead of the stage micro-smoke: "
                        "--pipeline [unsup|ptsup|train]")
    args = p.parse_args(argv)
    if args.launch:
        sys.exit(launch(args.launch, args.devices_per_proc, args.dump_dir,
                        pipeline=args.pipeline))
    worker(args.coordinator, args.num_processes, args.process_id,
           args.devices_per_proc, args.dump_dir, pipeline=args.pipeline)


if __name__ == "__main__":
    main()
