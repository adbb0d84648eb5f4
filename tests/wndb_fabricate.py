"""Fabricate a miniature WordNet database in WNDB format.

Produces a corpus directory that BOTH consumers of WordNet data in the
parity rig can read from the same bytes:

- nltk's ``WordNetCorpusReader`` (what the reference's
  ``get_wordnet_dict()`` uses, ``local_utils/clip_lang_util.py:113-137``)
  — point ``NLTK_DATA`` at the parent so ``corpora/wordnet`` resolves;
- our ``scd_tpu.naming.wordnet.Taxonomy.from_wndb`` (the repo's own WNDB
  parser).

The WNDB layout (``wndb(5WN)``): ``data.noun`` lines are
``offset lex_filenum ss_type w_cnt(word lex_id)+ p_cnt(ptr)* | gloss``
with the offset equal to the BYTE position of the line start, so the
writer lays lines out with fixed-width 8-digit offsets and resolves
positions in a second pass (line lengths are offset-independent).
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

_HEADER = (
    "  1 This is a fabricated miniature WordNet 3.0 Copyright notice line\n"
    "  2 for test fixtures only; real WNDB headers carry the license.\n")


def build_wndb(out_dir: str, tree: Dict[str, Sequence[str]],
               lemmas: Dict[str, Sequence[str]] = None) -> Dict[str, int]:
    """Write a WNDB corpus into ``out_dir``.

    ``tree``: synset id -> list of child synset ids (hyponyms); every
    synset must appear as a key (leaves map to []).  Exactly one root
    (a key that is nobody's child) is required so lch paths always meet.
    ``lemmas``: synset id -> word list (defaults to [synset id]); the
    FIRST word is what ``wnid_to_name`` keys on, reference- and repo-side.

    Returns synset id -> byte offset (the wnid is ``n%08d % offset``).
    """
    os.makedirs(out_dir, exist_ok=True)
    lemmas = lemmas or {}
    sids = list(tree.keys())
    children = {s: list(tree[s]) for s in sids}
    parents: Dict[str, List[str]] = {s: [] for s in sids}
    for s, kids in children.items():
        for kid in kids:
            parents[kid].append(s)

    def words(sid: str) -> List[str]:
        return list(lemmas.get(sid, [sid]))

    def line_for(sid: str, offsets: Dict[str, int]) -> str:
        ws = words(sid)
        ptrs = ([("@", p) for p in parents[sid]]
                + [("~", c) for c in children[sid]])
        parts = [f"{offsets[sid]:08d}", "03", "n", f"{len(ws):02x}"]
        for w in ws:
            parts += [w, "0"]
        parts.append(f"{len(ptrs):03d}")
        for sym, tgt in ptrs:
            parts += [sym, f"{offsets[tgt]:08d}", "n", "0000"]
        return " ".join(parts) + f" | fabricated gloss for {sid}  \n"

    # two passes: dummy offsets fix the line lengths, then real positions
    dummy = {s: 0 for s in sids}
    offsets: Dict[str, int] = {}
    pos = len(_HEADER.encode())
    for s in sids:
        offsets[s] = pos
        pos += len(line_for(s, dummy).encode())

    with open(os.path.join(out_dir, "data.noun"), "w") as f:
        f.write(_HEADER)
        for s in sids:
            f.write(line_for(s, offsets))

    # index.noun: lemma n synset_cnt p_cnt [ptr...] sense_cnt tagsense_cnt
    # offsets...  (nltk asserts synset_cnt == sense_cnt)
    lemma_to_offsets: Dict[str, List[int]] = {}
    for s in sids:
        for w in words(s):
            lemma_to_offsets.setdefault(w.lower(), []).append(offsets[s])
    with open(os.path.join(out_dir, "index.noun"), "w") as f:
        f.write(_HEADER)
        for lemma in sorted(lemma_to_offsets):
            offs = lemma_to_offsets[lemma]
            f.write(f"{lemma} n {len(offs)} 1 @ {len(offs)} 0 "
                    + " ".join(f"{o:08d}" for o in offs) + "  \n")

    # the remaining reader-required files: empty-but-valid
    for p in ("adj", "adv", "verb"):
        with open(os.path.join(out_dir, f"data.{p}"), "w") as f:
            f.write(_HEADER)  # data.adj header carries the version string
        with open(os.path.join(out_dir, f"index.{p}"), "w") as f:
            f.write(_HEADER)
    for p in ("adj", "adv", "noun", "verb"):
        open(os.path.join(out_dir, f"{p}.exc"), "w").close()
    open(os.path.join(out_dir, "index.sense"), "w").close()
    open(os.path.join(out_dir, "cntlist.rev"), "w").close()
    with open(os.path.join(out_dir, "lexnames"), "w") as f:
        f.write("00 adj.all 3\n01 adj.pert 3\n02 adv.all 2\n"
                "03 noun.Tops 1\n")
    return offsets


def demo_tree(width: int = 6, depth: int = 3) -> Dict[str, List[str]]:
    """A small single-rooted tree: root 'entity', ``width`` branches of
    ``depth`` chained specializations each — enough lch structure for
    soft-sACC to produce distinct values."""
    tree: Dict[str, List[str]] = {"entity": []}
    for b in range(width):
        parent = "entity"
        for lvl in range(depth):
            node = f"class{b}_{lvl}"
            tree.setdefault(parent, []).append(node)
            tree[node] = tree.get(node, [])
            parent = node
    return tree
