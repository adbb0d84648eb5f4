"""Prompt-ensembled zero-shot vocabulary embedding.

Reference: ``zeroshot_classifier`` (``clip_lang_util.py:96-108``) loops one
class name at a time — 80 templates tokenized, text-encoded, normalized,
averaged, renormalized — for ~68k names.  Here names are processed in large
batches: one [B*80, L] token batch per step feeds the text encoder, and the
normalize→mean-over-templates→renormalize reduction is a single jitted op on
[B, 80, D].  With the names axis sharded over the mesh the whole-vocabulary
embedding becomes embarrassingly parallel.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_TEMPLATE_COUNT = 80

# Compile-bounded sequence buckets for the text tower.  CLIP's text
# embedding is read at the EOT position of a CAUSAL transformer, so
# truncating the [N, 77] token batch to any length that still contains
# every row's EOT is mathematically exact (later positions are padding no
# earlier position can attend to).  Vocabulary prompts are short
# ("a photo of a {name}." ~ 10-20 tokens), so nearly every batch runs at
# 32 tokens — ~2.4x fewer FLOPs than the fixed 77-token context the
# reference always pays (``clip_lang_util.py:96-108``).  Throughput is
# near-linear in sequence length on v5e (measured: 28.4k prompts/s at
# seq=32, 35.3k at 24, 52.3k at 16 — the tower is layout/BW bound at these
# tiny sequences, not MXU bound), so finer buckets pay directly; four
# buckets bound the compile count at four programs.  The sharded builder
# length-sorts names so batches actually land in the tight buckets.
TEXT_SEQ_BUCKETS = (16, 24, 32, 77)


def truncate_to_eot_bucket(tokens: np.ndarray,
                           buckets: Sequence[int] = None) -> np.ndarray:
    """Slice [N, L] token rows to the smallest bucket covering every EOT.

    EOT is the per-row argmax token id (CLIP convention: EOT is the largest
    id in the vocabulary).  Exact — see ``TEXT_SEQ_BUCKETS`` (read at call
    time so the bucket list stays configurable/patchable).
    """
    if buckets is None:
        buckets = TEXT_SEQ_BUCKETS
    tokens = np.asarray(tokens)
    need = int(tokens.argmax(axis=1).max()) + 1
    return tokens[:, :_bucket_for(need, tokens.shape[1], buckets)]


def _bucket_for(need: int, max_len: int, buckets: Sequence[int] = None) -> int:
    """Smallest configured bucket covering ``need`` tokens (capped at the
    row length) — the bucket ``truncate_to_eot_bucket`` would pick."""
    if buckets is None:
        buckets = TEXT_SEQ_BUCKETS
    for b in buckets:
        if b >= need and b <= max_len:
            return b
    return max_len


from functools import lru_cache


@lru_cache(maxsize=32)
def _encode_reduce_fn(forward, b: int, t: int, row_sharding):
    """Cached jit of encode+ensemble-reduce: building it per call would
    retrace (and remote-recompile) the text tower on every invocation —
    the same per-call-jit trap ``naming/loop.py`` documents.  Keyed by the
    forward function object, the batch geometry, and the (hashable)
    output sharding.

    Retention caveat: keying on the function OBJECT means pipelines that
    rebuild encoders per run (closure-fresh forwards) accumulate up to
    ``maxsize`` jitted text-tower executables (plus their sharding refs)
    for the process lifetime — bounded at 32, which is a few hundred MB of
    host-side executables at ViT-B scale only if an app rebuilds encoders
    32 times in one process; key on a stable model identity if that ever
    becomes a real usage pattern."""
    jit_kwargs = {} if row_sharding is None else {"out_shardings": row_sharding}

    @partial(jax.jit, **jit_kwargs)
    def encode_reduce(v, tokens):  # tokens [B*T, L] (row-sharded w/ mesh)
        emb = forward(v, tokens)  # [B*T, D]
        return _ensemble_reduce.__wrapped__(emb.reshape(b, t, -1))  # [B, D]

    return encode_reduce


@lru_cache(maxsize=32)
def _encode_fn(forward, b: int, t: int, row_sharding):
    """Encode-only jit (no reduce): [b*t, L] tokens -> [b, t, D] raw
    embeddings.  Used by the template-length-grouped build, where each
    group encodes at its own (tighter) seq bucket and the ensemble reduce
    runs once over the concatenated groups."""
    jit_kwargs = {} if row_sharding is None else {"out_shardings": row_sharding}

    @partial(jax.jit, **jit_kwargs)
    def encode(v, tokens):
        emb = forward(v, tokens)  # [b*t, D]
        return emb.reshape(b, t, -1)

    return encode


@lru_cache(maxsize=8)
def _group_reduce_fn(n_groups: int, row_sharding):
    """Concatenate per-group [b, Tg, D] embeddings along the template axis
    and ensemble-reduce (the mean over templates is permutation-invariant,
    so group order never matters)."""
    jit_kwargs = {} if row_sharding is None else {"out_shardings": row_sharding}

    @partial(jax.jit, **jit_kwargs)
    def reduce(parts):
        return _ensemble_reduce.__wrapped__(jnp.concatenate(parts, axis=1))

    return reduce


@jax.jit
def _ensemble_reduce(emb: jnp.ndarray) -> jnp.ndarray:
    """[B, T, D] raw text embeddings -> [B, D] prompt-ensembled weights."""
    emb = emb.astype(jnp.float32)
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    mean = jnp.mean(emb, axis=1)
    return mean / jnp.linalg.norm(mean, axis=-1, keepdims=True)


@lru_cache(maxsize=8)
def _prefix_kv_fn(prefix_forward):
    """Jitted prefix-row encode: [T, P] tokens -> per-layer KV stacks."""
    return jax.jit(prefix_forward)


@lru_cache(maxsize=16)
def _suffix_accum_fn(suffix_forward, n: int, s: int, row_sharding):
    """Jitted accumulate step of the prefix-cached build: encode one
    template's [n, s] suffix rows against its cached prefix KV and add the
    NORMALIZED embeddings into the running f32 ensemble sum.  ``acc`` is
    donated, so the 80-template chain streams through one buffer."""
    jit_kwargs = {"donate_argnums": (5,)}
    if row_sharding is not None:
        jit_kwargs["out_shardings"] = row_sharding

    @partial(jax.jit, **jit_kwargs)
    def step(v, kv, t_idx, p_len, tokens, acc):
        k, vv = kv
        emb = suffix_forward(v, tokens, (k[:, t_idx], vv[:, t_idx]),
                             p_len).astype(jnp.float32)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return acc + emb

    return step


@lru_cache(maxsize=16)
def _full_accum_fn(forward, n: int, length: int, row_sharding):
    """Accumulate step for templates the splice cannot cover: full-row
    encode + normalize + add (same ensemble sum as ``_suffix_accum_fn``)."""
    jit_kwargs = {"donate_argnums": (2,)}
    if row_sharding is not None:
        jit_kwargs["out_shardings"] = row_sharding

    @partial(jax.jit, **jit_kwargs)
    def step(v, tokens, acc):
        emb = forward(v, tokens).astype(jnp.float32)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return acc + emb

    return step


@lru_cache(maxsize=8)
def _ensemble_finalize_fn(t_count: int, row_sharding):
    """Ensemble sum -> reference reduction: mean over templates,
    renormalize (``_ensemble_reduce`` on a precomputed sum)."""
    jit_kwargs = {} if row_sharding is None else {
        "out_shardings": row_sharding}

    @partial(jax.jit, **jit_kwargs)
    def fin(acc):
        mean = acc / t_count
        return mean / jnp.linalg.norm(mean, axis=-1, keepdims=True)

    return fin


def build_zeroshot_weights(encode_text_fn: Callable[[List[str]], np.ndarray],
                           classnames: Sequence[str],
                           templates: Sequence[str],
                           names_per_batch: int = 64,
                           mesh=None) -> np.ndarray:
    """Build the [D, V] zero-shot weight matrix (column per name).

    ``encode_text_fn`` maps a list of prompt strings to raw (unnormalized)
    embeddings [len(texts), D] — typically the JAX CLIP text encoder; any
    callable works (tests use a deterministic hash embedding).

    With a ``mesh`` AND an ``encode_text_fn`` exposing ``forward`` /
    ``variables`` / ``tokenize`` attributes (the pipeline's CLIP closure
    does), the names axis is sharded over the mesh's data axis —
    the ~68k-name vocabulary build is embarrassingly parallel and scales
    linearly with chips (round-1 cold-start: ~9 min on one chip).
    """
    if hasattr(encode_text_fn, "forward") and (
            mesh is not None or len(classnames) >= 2 * names_per_batch):
        # raw encoder pieces available and the build is large enough to
        # amortize: use the pipelined builder (host tokenization overlaps
        # device encode; optionally mesh-sharded).  Tiny calls — e.g. the
        # missing-classname repair encoding a handful of names — stay on
        # the plain path rather than padding to a whole batch.
        from scd_tpu.core.multihost import is_multiprocess

        if (os.environ.get("SCD_PREFIX_VOCAB", "0") == "1"
                and hasattr(encode_text_fn, "prefix_forward")
                and hasattr(encode_text_fn.tokenize, "template_pieces")
                and not is_multiprocess()
                and len(classnames) >= 2 * names_per_batch):
            # prefix-KV-cached build: each template's shared prefix is
            # encoded once; prompts re-run only name+tail tokens.  OPT-IN
            # (SCD_PREFIX_VOCAB=1), not the default: measured on the v5e
            # (8192 WordNet-like names x 80 templates, warm) it TIES the
            # full-row builder — 37.8k vs 38.4k prompts/s — because the
            # full build is already tower-FLOP-bound and the suffix
            # bucket grid (8/16) plus 80 small per-template dispatches
            # eat the ~30% token saving, while its cold compile costs
            # 636s vs 32s (remote-compiled prefix-attention variants).
            # Exactness is proven either way (min cosine 0.999999 on
            # chip; CPU tests assert 1e-5).  Multi-controller processes
            # keep the sharded full-row build (its pod contracts are
            # proven).
            return build_zeroshot_weights_prefix(
                encode_text_fn.forward, encode_text_fn.prefix_forward,
                encode_text_fn.suffix_forward, encode_text_fn.variables,
                encode_text_fn.tokenize, classnames, templates, mesh)
        return build_zeroshot_weights_sharded(
            encode_text_fn.forward, encode_text_fn.variables,
            encode_text_fn.tokenize, classnames, templates, mesh,
            names_per_batch=names_per_batch)
    t = len(templates)
    cols = []
    for start in range(0, len(classnames), names_per_batch):
        batch = classnames[start:start + names_per_batch]
        texts = [tmpl.format(name) for name in batch for tmpl in templates]
        emb = np.asarray(encode_text_fn(texts))  # [B*T, D]
        emb = emb.reshape(len(batch), t, -1)
        cols.append(np.asarray(_ensemble_reduce(jnp.asarray(emb))))
    weights = np.concatenate(cols, axis=0)  # [V, D]
    return weights.T.astype(np.float32)  # [D, V] — reference layout


def build_zeroshot_weights_sharded(forward, variables, tokenize,
                                   classnames: Sequence[str],
                                   templates: Sequence[str], mesh=None,
                                   names_per_batch: int = 64,
                                   data_axis: str = "data",
                                   template_groups: int = 3) -> np.ndarray:
    """Pipelined (and optionally mesh-sharded) vocabulary embedding.

    ``forward(variables, tokens [B, L] i32) -> [B, D]`` is the jittable raw
    text encoder; ``tokenize(texts) -> [len(texts), L] i32`` runs on host.
    With a ``mesh``, each batch of names is padded to a multiple of the
    data-axis size, its token rows are placed with a row sharding, and the
    encoder + ensemble reduction run as ONE jitted program over the mesh —
    XLA keeps every chip on its own V/n slice of the vocabulary; the
    gathered [D, V] weights are bitwise identical to the single-device
    build (weights are replicated, and each name's 80-template block stays
    on one shard).  With ``mesh=None`` the same pipelined loop runs
    unsharded on the default device.

    Multi-controller (``jax.process_count() > 1``): every process calls
    with the SAME full ``classnames`` over the global mesh; each batch's
    token rows assemble from per-process slices, the encode runs over all
    the pod's chips, and the finished [D, V] matrix returns on every host.

    Note: the ``template_groups`` split path reorders the templates inside
    the ensemble mean (length-sorted group concatenation), so grouped
    output differs from ``template_groups=1`` at float-reassociation
    level (~1e-7) — mesh vs no-mesh stays bitwise equal either way, but
    don't ``assert_array_equal`` grouped output against ungrouped goldens.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from scd_tpu.core.multihost import (host_fetch, is_multiprocess,
                                        replicate_to_mesh,
                                        rows_from_process_local)

    n_dev = mesh.shape[data_axis] if mesh is not None else 1
    t = len(templates)
    b = max(names_per_batch // n_dev, 1) * n_dev  # whole names per shard

    if mesh is not None:
        row = NamedSharding(mesh, P(data_axis))
        variables = replicate_to_mesh(mesh, variables)
        if is_multiprocess():
            # multi-controller pod build: every process runs this loop
            # over the SAME full vocabulary (host tokenization is
            # duplicated — cheap next to the encode); each contributes
            # its own slice of every token batch, so the device encode
            # splits over ALL the pod's chips.  Token rows are
            # name-major and b divides by the global device count, so
            # each process's contiguous slice holds whole names.
            def put_tokens(tok):
                tok = np.asarray(tok)
                per = tok.shape[0] // jax.process_count()
                r = jax.process_index()
                return rows_from_process_local(
                    mesh, tok[r * per:(r + 1) * per])[0]
        else:
            put_tokens = lambda tok: jax.device_put(tok, row)
    else:
        row = None
        put_tokens = lambda tok: tok
    encode_reduce = _encode_reduce_fn(forward, b, t, row)

    # Pipelined host/device loop: dispatch is async, so NOT fetching each
    # batch result lets the host tokenize batch i+1 while the device
    # encodes batch i — host BPE tokenization is otherwise serialized with
    # the encoder and becomes the bottleneck once the names axis is
    # sharded over several chips.  A sliding block bounds in-flight work.
    # Length-sorted batching: one long name forces its whole 64-name batch
    # into a bigger seq bucket, so sort names by their own token length
    # (prompt length = constant templates + name) and scatter the built
    # columns back to the original order at the end.  Measured: the
    # 16/24-token buckets run 1.8x/1.25x the 32-bucket throughput.
    order = None
    if len(classnames) > 4 * b:
        name_tok = np.asarray(tokenize(list(classnames)), np.int32)
        order = np.argsort(name_tok.argmax(axis=1), kind="stable")
        classnames = [classnames[i] for i in order]

    # Template-length grouping: the per-batch seq bucket is set by the
    # LONGEST (template + name) prompt, so one long template can pin the
    # whole batch to a bigger bucket.  Templates are length-sorted into
    # groups; a batch splits into per-group encodes ONLY when the groups
    # actually land in different buckets.  Measured on v5e (ViT-B text
    # tower, 1024 names x 80 templates, warm): 1.41x when the groups
    # straddle buckets; a blind always-split is a 19% REGRESSION when
    # they don't (extra dispatches + an unfused reduce buy nothing),
    # which is why the split is per-batch adaptive.  The ensemble mean is
    # permutation-invariant over templates, so the grouped reduce is
    # exactly the ungrouped one.
    groups = [list(range(t))]
    if (template_groups > 1 and hasattr(tokenize, "prompt_tokens")
            and t >= 8 and len(classnames) > 4 * b):
        tmpl_len = tokenize.prompt_tokens(templates, [""]).argmax(axis=1)
        t_order = np.argsort(tmpl_len, kind="stable")
        groups = [g.tolist()
                  for g in np.array_split(t_order, template_groups)
                  if len(g)]

    cols, valids = [], []
    for i, start in enumerate(range(0, len(classnames), b)):
        batch = list(classnames[start:start + b])
        valid = len(batch)
        batch += [batch[-1]] * (b - valid)  # pad with a repeat, drop below
        if hasattr(tokenize, "prompt_tokens"):
            # compositional fast path (CLIPTokenizer): each template piece
            # and each name BPE-encoded once instead of per pair — host
            # tokenization otherwise bounds the pipelined build
            tokens_all = np.asarray(
                tokenize.prompt_tokens(templates, batch), np.int32)
        else:
            texts = [tmpl.format(name) for name in batch
                     for tmpl in templates]
            tokens_all = np.asarray(tokenize(texts), np.int32)  # [b*T, L]
        split = None
        if len(groups) > 1:
            eot = tokens_all.argmax(axis=1).reshape(b, t)
            whole = _bucket_for(int(eot.max()) + 1, tokens_all.shape[1])
            per_g = [_bucket_for(int(eot[:, g].max()) + 1,
                                 tokens_all.shape[1]) for g in groups]
            if any(gb < whole for gb in per_g):
                split = per_g
        if split is not None:
            tok3 = tokens_all.reshape(b, t, -1)
            parts = []
            for g, gb in zip(groups, split):
                toks = tok3[:, g, :gb].reshape(b * len(g), gb)
                toks = put_tokens(toks)  # host np in, placed per backend
                parts.append(_encode_fn(forward, b, len(g), row)(
                    variables, toks))
            cols.append(_group_reduce_fn(len(groups), row)(parts))
        else:
            tokens = put_tokens(truncate_to_eot_bucket(tokens_all))
            cols.append(encode_reduce(variables, tokens))
        valids.append(valid)
        if i >= 32:
            jax.block_until_ready(cols[i - 32])  # backpressure
    # host_fetch: np.asarray when addressable; all-process gather on a pod
    weights = np.concatenate(
        [host_fetch(c)[:v] for c, v in zip(cols, valids)], axis=0)  # [V, D]
    if order is not None:  # undo the length sort
        unsorted = np.empty_like(weights)
        unsorted[order] = weights
        weights = unsorted
    return weights.T.astype(np.float32)  # [D, V]


# Suffix-row bucket grid of the prefix-cached build.  Vocabulary prompts
# put 1-5 name tokens + a 1-6 token template tail + EOT in the suffix, so
# nearly everything lands in the 8 bucket — HALF the 16-token bucket the
# full-row build pays per prompt (the shared prefix is the other half and
# is encoded once per template instead of 68k times).
PREFIX_SUFFIX_BUCKETS = (8, 16)
PREFIX_ROW_MAX = 16  # templates with longer [SOT]+prefix rows fall back


def build_zeroshot_weights_prefix(forward, prefix_forward, suffix_forward,
                                  variables, tokenize,
                                  classnames: Sequence[str],
                                  templates: Sequence[str], mesh=None,
                                  names_per_chunk: int = 8192,
                                  data_axis: str = "data") -> np.ndarray:
    """Prefix-KV-cached vocabulary embedding: encode each template's shared
    prefix ONCE, then run only ``name + template-tail + EOT`` tokens.

    The reference re-encodes the full prompt for every (name, template)
    pair (``clip_lang_util.py:96-108``: 68k names x 80 templates x ~16
    padded tokens).  In a CAUSAL tower the prefix activations depend only
    on prefix tokens, so each template's per-layer K/V projections are
    computed once ([80, 8] rows, one dispatch) and every prompt re-runs
    only its suffix — typically 3-8 tokens, bucket 8 vs the full build's
    16 — attending [cached prefix, own causal] (``models/clip.py::
    TextTransformer`` prefix modes).  The ensemble reduction streams on
    device: per name-chunk, 80 accumulate dispatches add normalized
    embeddings into a donated f32 sum, one finalize renormalizes, one
    [N, D] fetch returns.

    Measured verdict (v5e, ViT-B/16 text tower, 8192 WordNet-like names x
    80 ImageNet templates, warm): **a tie** — 37.8k prompts/s vs the
    full-row builder's 38.4k — with a 636s vs 32s cold compile.  The
    full build is already tower-FLOP-bound (its 17s ~= 655k prompts at
    the measured bucket-16 encode rate; host splice tokenization is
    ~2.5s, pipelined), and the theoretical ~30% token saving here is
    spent on the coarse suffix bucket grid (a chunk-wide max name length
    + the longest template tails push most rows from bucket 8 to 16) and
    80 small per-template dispatches (~33 ms fixed round-trip each on
    this transport).  Hence the pipeline keeps the full-row builder by
    default and this path is opt-in (``SCD_PREFIX_VOCAB=1``) — the KV
    plumbing it rides (``TextTransformer`` prefix modes) is exactness-
    tested and available to serving paths with born-short suffixes.

    Exactness: the splice is token-exact (``tokenizer.template_pieces``
    hazard analysis); attention sees the same keys in the same order at
    the same dtypes, so outputs match the full-row forward to float
    rounding (~1e-6 f32 / bf16 lsb — the same class of difference the
    grouped sharded build documents).  Pairs the splice cannot cover
    (non-'{}' placeholders, punctuation-merge hazards, over-long names)
    fall back: whole fallback TEMPLATES accumulate via full-row encode
    dispatches, fallback NAMES route through
    ``build_zeroshot_weights_sharded`` — every output column is exact.

    Multi-controller processes use the sharded builder instead (the
    dispatcher in ``build_zeroshot_weights`` handles this); with a
    single-controller ``mesh`` the suffix rows and ensemble sum shard over
    the data axis and the KV cache + weights replicate.
    """
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as PS

    sot, eot = tokenize.sot_id, tokenize.eot_id
    context_length = 77
    pieces = tokenize.template_pieces(templates)

    # ---- classify templates: cached (spliceable, short prefix) vs fallback
    cached = []  # (template_idx, prefix_row, suffix_tail)
    fallback_t = []
    any_pre_punct = any_suf_punct = False
    for ti, (pre, suf, tmpl, pre_p, suf_p) in enumerate(pieces):
        prow = None if pre is None else [sot] + pre
        if prow is None or len(prow) > PREFIX_ROW_MAX:
            fallback_t.append(ti)
            continue
        cached.append((ti, prow, list(suf) + [eot]))
        any_pre_punct |= pre_p
        any_suf_punct |= suf_p
    if not cached:
        return build_zeroshot_weights_sharded(
            forward, variables, tokenize, classnames, templates, mesh)

    max_plen = max(len(prow) for _, prow, _ in cached)
    max_tail = max(len(tail) for _, _, tail in cached)
    s_cap = min(PREFIX_SUFFIX_BUCKETS[-1], context_length - max_plen)

    # ---- classify names: hazard boundaries / over-long suffixes fall back
    name_toks = [tokenize.encode(n) for n in classnames]
    cached_n, fallback_n = [], []
    for ni, name in enumerate(classnames):
        head_p, tail_p = tokenize.name_boundary_punct(name)
        if ((head_p and any_pre_punct) or (tail_p and any_suf_punct)
                or len(name_toks[ni]) + max_tail + 1 > s_cap):
            fallback_n.append(ni)
        else:
            cached_n.append(ni)
    if not cached_n:
        return build_zeroshot_weights_sharded(
            forward, variables, tokenize, classnames, templates, mesh)

    n_dev = mesh.shape[data_axis] if mesh is not None else 1
    if mesh is not None:
        row = NamedSharding(mesh, PS(data_axis))
        repl = NamedSharding(mesh, PS())
        variables = jax.device_put(variables, repl)
        put_rows = lambda a: jax.device_put(a, row)
    else:
        row = None
        put_rows = lambda a: jnp.asarray(a)

    # ---- one dispatch encodes every cached template's prefix KV
    p_bucket = _bucket_for(max_plen, PREFIX_ROW_MAX,
                           buckets=PREFIX_SUFFIX_BUCKETS)
    prow_mat = np.zeros((len(cached), p_bucket), np.int32)
    for i, (_, prow, _) in enumerate(cached):
        prow_mat[i, :len(prow)] = prow
    kv = _prefix_kv_fn(prefix_forward)(variables, jnp.asarray(prow_mat))
    if mesh is not None:
        kv = jax.device_put(kv, repl)
    d = jax.eval_shape(
        suffix_forward, jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables),
        jax.ShapeDtypeStruct((8, 8), jnp.int32),
        jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape[:1] + a.shape[2:],
                                           a.dtype), kv),
        jax.ShapeDtypeStruct((), jnp.int32)).shape[-1]

    # ---- chunk cached names (length-sorted so chunks land in the tight
    # suffix bucket); scatter back to original order at the end
    order = sorted(cached_n, key=lambda ni: len(name_toks[ni]))
    chunk = max(min(names_per_chunk, len(order)) // n_dev, 1) * n_dev
    results = []  # (device_weights, valid, name_indices)
    weights = np.zeros((len(classnames), d), np.float32)

    def drain(upto: int):
        while len(results) > upto:
            w_dev, valid, idxs = results.pop(0)
            weights[idxs] = np.asarray(w_dev)[:valid]

    for start in range(0, len(order), chunk):
        idxs = order[start:start + chunk]
        valid = len(idxs)
        idxs_padded = idxs + [idxs[-1]] * (chunk - valid)
        ntk = [name_toks[i] for i in idxs_padded]
        nlen = np.fromiter((len(t) for t in ntk), np.int64, chunk)
        max_n = int(nlen.max())
        nmat = np.zeros((chunk, max_n), np.int32)
        for r, t in enumerate(ntk):
            nmat[r, :len(t)] = t
        acc = put_rows(np.zeros((chunk, d), np.float32))
        for t_pos, (ti, prow, tail) in enumerate(cached):
            s = _bucket_for(max_n + len(tail), s_cap,
                            buckets=PREFIX_SUFFIX_BUCKETS)
            rows = np.zeros((chunk, s), np.int32)
            rows[:, :max_n] = nmat
            rows[np.arange(chunk)[:, None],
                 nlen[:, None] + np.arange(len(tail))[None]] = \
                np.asarray(tail, np.int32)[None]
            acc = _suffix_accum_fn(suffix_forward, chunk, s, row)(
                variables, kv, jnp.int32(t_pos), jnp.int32(len(prow)),
                put_rows(rows), acc)
        for ti in fallback_t:
            texts = [pieces[ti][2].format(classnames[i])
                     for i in idxs_padded]
            rows = truncate_to_eot_bucket(
                np.asarray(tokenize(texts), np.int32))
            acc = _full_accum_fn(forward, chunk, rows.shape[1], row)(
                variables, put_rows(rows), acc)
        results.append((_ensemble_finalize_fn(len(templates), row)(acc),
                        valid, idxs))
        drain(2)  # bound in-flight chunks; host assembles ahead meanwhile
    drain(0)

    # ---- fallback names take the full-row sharded build (exact path)
    if fallback_n:
        w_fb = build_zeroshot_weights_sharded(
            forward, variables, tokenize,
            [classnames[i] for i in fallback_n], templates, mesh)  # [D, M]
        weights[fallback_n] = w_fb.T
    return weights.T.astype(np.float32)  # [D, V] — reference layout
