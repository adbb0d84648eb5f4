"""CLIP BPE tokenizer goldens.

Two layers of protection against a silent vocab-assembly or regex
regression (the failure mode: an off-by-one in the id space corrupts every
text embedding the moment real weights arrive — reference consumer
``clip_lang_util.py:102``):

1. **Synthetic-merges algorithm test (always runs)**: a 3-line merges
   fixture whose BPE outputs are computed by hand — exercises the merge
   loop, the end-of-word handling, the byte->unicode table and the id
   layout (256 byte tokens, 256 ``</w>`` variants, merges, SOT, EOT).

2. **Published-id goldens (skip unless a real merges file is present)**:
   known ``clip.tokenize`` outputs for real strings.  Sources: ids that
   are *structurally derivable* from the vocab layout (single-character
   words: ``"x</w>" id == 256 + printable-ASCII index``; SOT/EOT =
   49406/49407 for the 49152-merge release file), plus the widely
   published example tokenizations of the OpenAI CLIP release ("a photo
   of a cat/dog").  Set ``SCD_CLIP_BPE=/path/to/
   bpe_simple_vocab_16e6.txt.gz`` to enable.
"""

import gzip
import os

import numpy as np
import pytest

from scd_tpu.models.tokenizer import CLIPTokenizer, bytes_to_unicode

# -------------------------------------------------- structural id helpers

def _single_char_id(ch: str) -> int:
    """Id of the one-character word token ``ch + '</w>'`` — position 256 +
    index in the byte vocab, whose first block is printable ASCII '!'..'~'
    in order (bytes_to_unicode construction)."""
    vocab = list(bytes_to_unicode().values())
    return 256 + vocab.index(ch)


SOT_ID, EOT_ID = 49406, 49407
A_ID = _single_char_id("a")            # == 320 (97 - 33 + 256)

# clip.tokenize goldens for the release bpe_simple_vocab_16e6.txt.gz.
# Single-char ids are structural (see _single_char_id); multi-char word
# ids are the published OpenAI-CLIP example tokenizations.
REAL_GOLDENS = {
    "a": [SOT_ID, A_ID, EOT_ID],
    "!": [SOT_ID, _single_char_id("!"), EOT_ID],
    "7": [SOT_ID, _single_char_id("7"), EOT_ID],
    "a photo of a cat": [SOT_ID, 320, 1125, 539, 320, 2368, EOT_ID],
    "a photo of a dog": [SOT_ID, 320, 1125, 539, 320, 1929, EOT_ID],
    "a photo of a cat.": [SOT_ID, 320, 1125, 539, 320, 2368,
                          _single_char_id("."), EOT_ID],
    "A PHOTO OF A CAT": [SOT_ID, 320, 1125, 539, 320, 2368, EOT_ID],
}


def _real_merges_path():
    cands = [os.environ.get("SCD_CLIP_BPE", "")]
    cands += ["assets/bpe_simple_vocab_16e6.txt.gz",
              "/data/bpe_simple_vocab_16e6.txt.gz"]
    for c in cands:
        if c and os.path.exists(c):
            return c
    return None


# ------------------------------------------------ synthetic-merges fixture

@pytest.fixture()
def tiny_tokenizer(tmp_path):
    """Merges: ('c','a') rank 0, ('ca','t</w>') rank 1, ('d','o') rank 2.
    Vocab layout: bytes 0..255, '</w>' forms 256..511, merges 512..514,
    SOT 515, EOT 516."""
    path = tmp_path / "merges.txt.gz"
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("#version header\n")
        f.write("c a\n")
        f.write("ca t</w>\n")
        f.write("d o\n")
    return CLIPTokenizer(str(path))


def test_tiny_vocab_layout(tiny_tokenizer):
    t = tiny_tokenizer
    assert len(t.encoder) == 256 * 2 + 3 + 2
    assert t.encoder["<|startoftext|>"] == 515
    assert t.encoder["<|endoftext|>"] == 516
    assert t.encoder["a</w>"] == A_ID
    assert t.encoder["ca"] == 512
    assert t.encoder["cat</w>"] == 513
    assert t.encoder["do"] == 514


def test_tiny_bpe_merge_sequence(tiny_tokenizer):
    t = tiny_tokenizer
    # 'cat' -> (c,a,t</w>) -> merge rank0 -> (ca, t</w>) -> merge rank1
    assert t.encode("cat") == [513]
    # 'ca' ends the word after 'a': pair is (c, a</w>) — NOT the (c, a)
    # merge; stays split as byte 'c' + 'a</w>'
    assert t.encode("ca") == [_single_char_id("c") - 256, A_ID]
    # 'dog': (d,o,g</w>) -> merge rank2 -> (do, g</w>); no further merge
    assert t.encode("dog") == [514, _single_char_id("g")]
    # regex lowercases + splits punctuation into its own token
    assert t.encode("Cat!") == [513, _single_char_id("!")]


def test_tiny_call_contract(tiny_tokenizer):
    t = tiny_tokenizer
    out = t(["cat", "cat dog"], context_length=6)
    assert out.shape == (2, 6) and out.dtype == np.int32
    np.testing.assert_array_equal(out[0], [515, 513, 516, 0, 0, 0])
    np.testing.assert_array_equal(
        out[1], [515, 513, 514, _single_char_id("g"), 516, 0])
    # truncation: final token forced to EOT (clip.tokenize(truncate=True))
    long = t(["cat " * 10], context_length=5)[0]
    np.testing.assert_array_equal(long, [515, 513, 513, 513, 516])


# ----------------------------------------------------- real-merges goldens

@pytest.mark.skipif(_real_merges_path() is None,
                    reason="real CLIP merges file not present "
                           "(set SCD_CLIP_BPE)")
def test_real_clip_tokenize_goldens():
    t = CLIPTokenizer(_real_merges_path())
    assert len(t.encoder) == 49408
    assert t.encoder["<|startoftext|>"] == SOT_ID
    assert t.encoder["<|endoftext|>"] == EOT_ID
    for text, want in REAL_GOLDENS.items():
        got = [int(x) for x in t([text])[0]]
        assert got[:len(want)] == want and all(
            v == 0 for v in got[len(want):]), (text, got[:10])
    # 77-token truncation: 100 'a' words overflow; last token must be EOT
    toks = t(["a " * 100])[0]
    assert toks[0] == SOT_ID and toks[-1] == EOT_ID
    assert (toks[1:-1] == A_ID).all()


def test_prompt_tokens_matches_full_tokenization(tiny_tokenizer):
    """The compositional prompt fast path (template pieces + names encoded
    once, spliced) must match per-pair tokenization exactly — the CLIP
    regex splits words/punctuation before BPE, so splicing at the {}
    boundary is lossless for every template that keeps the name
    word-delimited (all 80 ImageNet templates do)."""
    t = tiny_tokenizer
    # the last three exercise the FALLBACK: indexed/named placeholders and
    # a boundary-glued '{}s' cannot be spliced and must per-pair encode
    # t.format(n) — previously '{0}' silently DROPPED the name
    # "o'{}": apostrophe-final prefix — the regex contraction alternatives
    # ('s|'t|...) fuse "'"+letter in the full encode; must per-pair encode
    # '"{}"' + an EMPTY name makes the pre/suf quotes directly adjacent:
    # the full encode fuses '""' into one punctuation run where the old
    # splice emitted two tokens
    templates = ["a {}.", "the cat {}", "{}!", "no placeholder",
                 "a {0}.", "a {}s", "o'{}", 'a "{}" x']
    # 'cat.' / '.dog' exercise the punctuation-boundary fallback: a name
    # ending (starting) in punctuation next to a punct template boundary
    # merges into ONE [^\s\w]+ regex token in the full encode ('..', '!.')
    # but stayed split in the old splice path; ''/' ' exercise the
    # empty-name adjacency fallback
    names = ["cat", "dog", "cat dog", "cat.", ".dog", "ph.d.", "", " "]
    full = t([tmpl.format(n) for n in names for tmpl in templates],
             context_length=12)
    fast = t.prompt_tokens(templates, names, context_length=12)
    np.testing.assert_array_equal(fast, full)


def test_grouped_vocab_build_matches_ungrouped(tiny_tokenizer):
    """Template-length grouping (short templates encode at tighter seq
    buckets) must produce exactly the ungrouped weights — the ensemble
    mean is permutation-invariant over templates."""
    import jax.numpy as jnp

    from scd_tpu.naming.zeroshot import build_zeroshot_weights_sharded

    t = tiny_tokenizer
    rng = np.random.default_rng(0)
    names = ["".join(rng.choice(list("catdog "), size=rng.integers(2, 9))).strip() or "cat"
             for _ in range(40)]
    templates = (["a {}."] * 3 + ["the big {}"] * 3
                 + ["one very long template about a {} indeed"] * 2)
    table = jnp.asarray(rng.standard_normal((600, 12)), jnp.float32)

    def fwd(v, toks):
        # length-invariant like the real tower (which gathers at EOT):
        # pads (id 0) contribute nothing, so the per-group seq bucket
        # cannot change the embedding
        ids = jnp.clip(toks, 0, 599)
        emb = jnp.take(v["t"], ids, axis=0)
        return jnp.where((toks != 0)[..., None], emb, 0.0).sum(axis=1)

    v = {"t": table}
    from scd_tpu.naming import zeroshot as zs
    calls = []
    orig = zs._group_reduce_fn

    def counting(n_groups, row):
        calls.append(n_groups)
        return orig(n_groups, row)

    zs._group_reduce_fn = counting
    try:
        grouped = build_zeroshot_weights_sharded(
            fwd, v, t, names, templates, names_per_batch=8)
    finally:
        zs._group_reduce_fn = orig
    # the adaptive gate must have taken the split path (the long template
    # straddles a bucket) — otherwise this parity test is vacuous
    assert calls, "grouped path never triggered"

    class NoGroup:  # plain callable: no prompt_tokens -> single group
        def __call__(self, texts):
            return t(texts)
    plain = build_zeroshot_weights_sharded(fwd, v, NoGroup(), names,
                                           templates, names_per_batch=8)
    np.testing.assert_allclose(grouped, plain, atol=1e-5)
