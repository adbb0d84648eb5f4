# Vocab-build wall with realistic prompt lengths: old buckets vs new
# buckets + length-sorted batching. 8192 names x 80 templates on chip.
import time
import numpy as np
import jax, jax.numpy as jnp
from scd_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()
from scd_tpu.models import CLIPModel, clip_vit_b16_config
from scd_tpu.naming import zeroshot as zs
from scd_tpu.naming.templates import IMAGENET_TEMPLATES

cfg = clip_vit_b16_config(compute_dtype=jnp.bfloat16)
model = CLIPModel(cfg)
variables = jax.jit(model.init)(
    jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
    jnp.zeros((1, 77), jnp.int32))
jax.block_until_ready(variables)

def fwd(v, toks):
    return model.apply(v, toks, method=CLIPModel.encode_text)

rng = np.random.default_rng(0)
n_names = 8192
# realistic name token lengths: wordnet nouns are 1-5 BPE tokens
name_len = rng.choice([1, 2, 3, 4, 5], size=n_names,
                      p=[0.3, 0.35, 0.2, 0.1, 0.05])
tmpl_len = {t: 4 + (len(t.split())) for t in IMAGENET_TEMPLATES}  # ~6-14

names = [f"n{i}" for i in range(n_names)]
nlen = {nm: int(l) for nm, l in zip(names, name_len)}

def tokenize(texts):
    out = np.zeros((len(texts), 77), np.int32)
    for i, s in enumerate(texts):
        # s is either a bare name (the sorting pass) or template.format(name)
        parts = s.split()
        nm = next((p for p in parts if p.startswith("n") and p[1:].rstrip(".,!").isdigit()), None)
        base = len(parts) + 3
        ln = base + (nlen.get(nm.rstrip(".,!"), 2) if nm else 0)
        out[i, 0] = 49406
        out[i, min(ln, 76)] = 49407  # EOT = max id at position ln
    return out

DEFAULT = zs.TEXT_SEQ_BUCKETS
for label, buckets, sort in (("old (32,77) unsorted", (32, 77), False),
                             ("new (16,24,32,77) sorted", DEFAULT, True)):
    zs.TEXT_SEQ_BUCKETS = buckets  # read at call time now
    import scd_tpu.naming.zeroshot as z2
    # toggle sorting by shrinking the threshold
    orig = z2.build_zeroshot_weights_sharded
    t0 = time.perf_counter()
    if sort:
        w = z2.build_zeroshot_weights_sharded(fwd, variables, tokenize,
                                              names, IMAGENET_TEMPLATES)
    else:
        # bypass sort: pass <= 4*b names per call in chunks? simpler: call with
        # names in given order but sorting disabled via monkeypatch of argsort
        _as = np.argsort
        np.argsort = lambda *a, **k: np.arange(n_names)
        try:
            w = z2.build_zeroshot_weights_sharded(fwd, variables, tokenize,
                                                  names, IMAGENET_TEMPLATES)
        finally:
            np.argsort = _as
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.1f}s for 8192x80 "
          f"(68k proj: {dt * 68000 / 8192 / 60:.2f} min)", flush=True)
    assert w.shape[1] == n_names
