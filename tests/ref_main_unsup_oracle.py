"""Run the reference's ``main_unsup.py`` AS-IS on fabricated artifacts.

Subprocess runner for the composed-pipeline oracle test: installs the
dependency shims (no GPU / torchvision / Cython in this image), injects
the fabricated data (vocabulary path, dataset stubs — the reference
hardcodes ``/disk/...`` corpus paths and needs real image trees only for
objects the cached-entry path never touches), records every
``assign_name`` call, and then executes the reference script unmodified
via ``runpy``.  Nothing here alters the reference's ALGORITHMIC code:
stubs cover (a) hardware (``.cuda()`` -> identity on CPU tensors),
(b) absent packages, (c) data injection (fabricated corpus/vocab/
datasets).  The judged path — feature-cache re-entry, the composed
voting loop ``main_unsup.py:504-647``, every metric printout — runs the
reference's own bytes.

Usage (see tests/test_reference_parity.py):
    python ref_main_unsup_oracle.py <fab_root> <record_dir> [main_unsup args...]
with NLTK_DATA pointing at <fab_root>/nltk_data.
"""

import json
import os
import runpy
import sys
import types

import numpy as np

REF = "/root/reference"


def install_shims(fab_root: str, record_dir: str) -> None:
    for p in (REF, os.path.join(REF, "gcd")):
        if p not in sys.path:
            sys.path.append(p)

    # -- hardware: route .cuda() to the object itself (CPU run)
    import torch

    torch.Tensor.cuda = lambda self, *a, **kw: self  # type: ignore
    torch.nn.Module.cuda = lambda self, *a, **kw: self  # type: ignore

    # torch >= 2.6 flipped torch.load's weights_only default to True,
    # which rejects the numpy arrays the reference's caches contain; the
    # reference predates that — restore the historical default
    _orig_load = torch.load

    def _load(*a, **kw):
        kw.setdefault("weights_only", False)
        return _orig_load(*a, **kw)

    torch.load = _load

    # -- absent packages
    if not hasattr(np, "int"):
        np.int = int  # vendored Munkres uses the removed alias

    clip_stub = types.ModuleType("clip")

    class _StubCLIP:
        def eval(self):
            return self

        def cuda(self, *a, **kw):
            return self

    clip_stub.load = lambda name: (_StubCLIP(), None)
    # the dino_vit branch pulls its frozen tower from torch.hub
    # (main_unsup.py:241) — zero egress here, and the cached-entry path
    # never runs a forward, so a stub model suffices
    torch.hub.load = lambda *a, **kw: _StubCLIP()
    clip_stub.tokenize = lambda texts: (_ for _ in ()).throw(
        RuntimeError("stub clip.tokenize must not be reached on the "
                     "imagenet_100 cached-entry path"))
    sys.modules["clip"] = clip_stub

    for name in ("timm", "torchvision", "torchvision.transforms",
                 "torchvision.models"):
        stub = types.ModuleType(name)
        stub.__getattr__ = lambda _n: None  # type: ignore[attr-defined]
        sys.modules.setdefault(name, stub)

    pyx = types.ModuleType("pyximport")
    pyx.install = lambda *a, **k: None
    sys.modules.setdefault("pyximport", pyx)
    kmc = types.ModuleType("k_means_constrained")
    mcf = types.ModuleType("k_means_constrained.mincostflow_vectorized")
    mcf.SimpleMinCostFlowVectorized = None  # never reached (run_cluster off)
    kmc.mincostflow_vectorized = mcf
    sys.modules.setdefault("k_means_constrained", kmc)
    sys.modules.setdefault("k_means_constrained.mincostflow_vectorized", mcf)
    try:
        import sklearn.utils._joblib  # noqa: F401
    except ImportError:
        import joblib

        shim = types.ModuleType("sklearn.utils._joblib")
        shim.Parallel = joblib.Parallel
        shim.delayed = joblib.delayed
        shim.effective_n_jobs = joblib.effective_n_jobs
        sys.modules["sklearn.utils._joblib"] = shim

    # -- data injection: datasets (built but never iterated on the cached
    # path; only 'class_map' and the DataLoader len contracts matter)
    with open(os.path.join(fab_root, "class_map.json")) as f:
        class_map = {int(k): v for k, v in json.load(f).items()}

    from torch.utils.data import Dataset

    class _TinyDS(Dataset):
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("oracle datasets must never be iterated "
                               "(extract_feat=False cached entry)")

    gd = types.ModuleType("gcd.data.get_datasets")
    gd.get_datasets = lambda *a, **kw: (
        _TinyDS(), _TinyDS(), _TinyDS(), {"class_map": class_map})
    gd.get_class_splits = lambda args: args
    sys.modules["gcd.data.get_datasets"] = gd

    ga = types.ModuleType("gcd.data.augmentations")
    ga.get_transform = lambda *a, **kw: (None, None)
    sys.modules["gcd.data.augmentations"] = ga

    # -- vocabulary path: get_nouns hardcodes /disk/... (clip_lang_util.py:141)
    import local_utils.clip_lang_util as clu

    vocab = os.path.join(fab_root, "data", "wordnet_all_noun.txt")

    def get_nouns(corpus="wordnet"):
        assert corpus == "wordnet", corpus
        with open(vocab) as f:
            return [line.rstrip("\n") for line in f]

    clu.get_nouns = get_nouns

    # -- observation: record every assign_name call (inputs + outputs) so
    # the test can reconstruct the reference's per-iteration voted names
    os.makedirs(record_dir, exist_ok=True)
    orig_assign = clu.assign_name
    count = [0]

    def recording_assign(unique_name_idx, cluster_to_counter, num_common=4):
        ind, w = orig_assign(unique_name_idx, cluster_to_counter,
                             num_common=num_common)
        np.savez(os.path.join(record_dir, f"assign_{count[0]:03d}.npz"),
                 unique_name_idx=np.asarray(unique_name_idx, np.int64),
                 ind=np.asarray(ind, np.int64), w=np.asarray(w))
        count[0] += 1
        return ind, w

    clu.assign_name = recording_assign


def main():
    fab_root, record_dir = sys.argv[1], sys.argv[2]
    extra = sys.argv[3:]
    install_shims(fab_root, record_dir)
    sys.argv = ["main_unsup.py", "--root_dir", fab_root,
                "--dataset_name", "imagenet_100", "--feat_model", "dino_vit",
                "--extract_feat", "false", "--run_cluster", "false",
                "--save_cluster", "false", "--cluster", "KM",
                "--corpus", "wordnet"] + extra
    runpy.run_path(os.path.join(REF, "main_unsup.py"), run_name="__main__")


if __name__ == "__main__":
    main()
