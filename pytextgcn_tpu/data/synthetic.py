"""Deterministic synthetic corpora.

The reference's datasets (data/amazon, data/dbpedia — SURVEY.md §2.5) are
git-LFS blobs that are not present in the reference checkout, so tests and
benchmarks need a stand-in with the same *shape* of signal: documents drawn
from class-conditional word distributions (signature words per class +
shared background vocabulary), optionally with a 2-level label hierarchy for
the per-level / per-label pipelines.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

_SYLLABLES = [
    "ba", "be", "bi", "bo", "bu", "da", "de", "di", "do", "du",
    "ka", "ke", "ki", "ko", "ku", "la", "le", "li", "lo", "lu",
    "ma", "me", "mi", "mo", "mu", "na", "ne", "ni", "no", "nu",
    "ra", "re", "ri", "ro", "ru", "sa", "se", "si", "so", "su",
    "ta", "te", "ti", "to", "tu", "za", "ze", "zi", "zo", "zu",
]


def _make_words(n: int, rng: np.random.Generator) -> List[str]:
    words = set()
    while len(words) < n:
        k = rng.integers(2, 5)
        words.add("".join(rng.choice(_SYLLABLES, size=k)))
    return sorted(words)


def synthetic_corpus(
    n_docs: int = 200,
    n_classes: int = 4,
    n_parents: Optional[int] = None,
    vocab_per_class: int = 30,
    shared_vocab: int = 60,
    doc_len: Tuple[int, int] = (8, 40),
    signal: float = 0.55,
    seed: int = 0,
):
    """Generate (docs, labels[, parent_labels]).

    Each class owns ``vocab_per_class`` signature words; a document mixes
    signature words (probability ``signal``) with shared background words.
    If ``n_parents`` is given, classes are grouped into parents and the
    return value gains a parallel parent-label list (for the hierarchy
    pipelines, mirroring Amazon's Cat1/Cat2 columns).
    """
    rng = np.random.default_rng(seed)
    class_words = [
        np.array(_make_words(vocab_per_class, np.random.default_rng(seed + 1 + c)))
        for c in range(n_classes)
    ]
    background = np.array(_make_words(shared_vocab, np.random.default_rng(seed + 999)))

    docs, labels = [], []
    for i in range(n_docs):
        c = int(rng.integers(n_classes))
        length = int(rng.integers(doc_len[0], doc_len[1] + 1))
        sig = rng.random(length) < signal
        words = np.where(
            sig,
            class_words[c][rng.integers(0, len(class_words[c]), length)],
            background[rng.integers(0, len(background), length)],
        )
        docs.append(" ".join(words.tolist()))
        labels.append(c)

    if n_parents is None:
        return docs, labels
    parents = [c % n_parents for c in labels]
    return docs, labels, parents


# --------------------------------------------------------------------------
# Protocol-scale corpora
#
# Stand-ins for the git-LFS-absent Amazon / DBpedia CSVs (SURVEY.md §2.5) at
# the *shape* the reference protocols assume: the class counts of
# flat_amazon.py (6 Cat1 / 43 Cat2) and flat_dbpedia.py (9 l1 / 70 l2 /
# 219 l3), tens of thousands of documents, Zipfian word frequencies (the
# degree skew that stresses graph construction and the hot-set SpMM), and a
# class signal that is learnable but far from separable — sibling classes
# share their parent's vocabulary and differ only in word *frequencies*.
# --------------------------------------------------------------------------


def _ragged_split(n_children: int, n_parents: int, rng) -> np.ndarray:
    """Parent id for each child, with realistically uneven family sizes."""
    weights = rng.dirichlet(np.full(n_parents, 1.5))
    sizes = np.maximum(1, np.round(weights * n_children).astype(int))
    while sizes.sum() > n_children:
        sizes[np.argmax(sizes)] -= 1
    while sizes.sum() < n_children:
        sizes[np.argmin(sizes)] += 1
    return np.repeat(np.arange(n_parents), sizes)


def _zipf_probs(n: int, alpha: float) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1) ** alpha
    return p / p.sum()


# Calibrated generator knobs, one dict per protocol. These ARE the pinned
# corpus: every protocol-parity row in docs/protocol_results.csv was produced
# from them, so any edit silently shifts every published comparison —
# tests/test_synthetic_difficulty.py pins both the dicts and a content hash
# of the emitted stream (VERDICT r4 item 9).
PROTOCOL_CFGS = {
    "amazon": dict(
        levels=(6, 43),
        n_background=40_000, pool_size=600, bg_alpha=1.07,
        # background / parent-topic / child-topic token shares. The
        # weak parent share (2.5%) is deliberate: the reference's
        # flagship per-label gain (+11.9 acc points over flat,
        # results.csv:2 vs :14-16) is exactly the parent-inference
        # error flat pays and GT routing (eval_perlabel.py:73) doesn't,
        # so parent inference must be genuinely imperfect (~0.85 here).
        mix=(0.795, 0.025, 0.18),
        child_alpha=1.3,
        log_len=3.75, sig_len=0.45, min_len=12, max_len=220,
        train_frac=0.8, val_frac=0.0,
        # calibrated on chip (seed 42, flat GCN 500 epochs, torch-exact
        # amsgrad, r4): flat 0.5946/0.4742 vs published 0.599/0.424;
        # per-label GT-routed 0.7261/0.6420 vs published 0.718/0.527 —
        # BOTH bands hit simultaneously, gain +13.2 vs +11.9
        # (experiments/calibrate_perlabel_gain.py swept the proxy
        # triple; calibrate_difficulty.py + protocol_parity.py
        # confirmed on the real chip). r3 defaults (mix 0.70/0.12/0.18,
        # leaf_alias 0, prior_alpha 3.0) hit the flat band only, with
        # parent inference ~0.95 capping the per-label gain at +2.6.
        leaf_tilt=1.24, leaf_vocab_size=0, label_noise=0.0,
        leaf_alias=0.78, alias_tilt=1.28, prior_alpha=1.2,
        # macro-F1 shaping (VERDICT r4 item 4): scales each class's
        # leaf-topic token share by (p_c / p_max)^tail_tilt — rare classes
        # get weaker evidence, so tail recall (and macro-F1) collapses
        # while head-dominated accuracy holds, the reference's published
        # acc >> f1 profile (results.csv flat 0.599/0.424). 0.0 keeps the
        # r4-pinned stream bit-identical (the draw structure is shared).
        # tail_scope 'parent' rescales by the WITHIN-PARENT head class
        # instead of the global one: each parent's dominant child keeps
        # full evidence (parent-level and GT-routed accuracy hold) while
        # subordinate siblings collapse — the profile the published
        # per-label row shows (acc 0.718 vs f1 0.527, results.csv:12-16).
        tail_tilt=0.0, tail_scope="global",
    ),
    "dbpedia": dict(
        levels=(9, 70, 219),
        n_background=30_000, pool_size=220, bg_alpha=1.05,
        # bg / l1 / l2 / l3(dedicated): the leaf share is the main
        # separability dial — 0.25 put flat GCN at 0.978 (round 2)
        mix=(0.62, 0.13, 0.13, 0.12),
        child_alpha=1.15,
        log_len=3.6, sig_len=0.35, min_len=10, max_len=120,
        train_frac=0.75, val_frac=0.10,
        leaf_tilt=1.15, leaf_vocab_size=10, label_noise=0.04,
        leaf_alias=0.0, alias_tilt=None, prior_alpha=3.0,
        tail_tilt=0.0, tail_scope="global",
    ),
}


# Named override profiles on top of PROTOCOL_CFGS. 'amazon-f1' is the
# r5 macro-F1-calibrated variant (VERDICT r4 item 4): chip-confirmed
# flat GCN landing 0.5880 acc / 0.4226 f1 vs published 0.599/0.424 —
# the f1 half INSIDE the published seed range (results.csv:2,6,7 f1
# 0.4179-0.4287) via the within-parent tail collapse. It is a PROFILE,
# not a re-pin: every row in docs/protocol_results.csv stays keyed to
# the r4 pin above; use --corpus-set (drivers) or
# protocol_corpus("amazon-f1") to opt in.
PROTOCOL_PROFILES = {
    "amazon-f1": ("amazon", dict(tail_tilt=0.4, tail_scope="parent",
                                 mix=(0.755, 0.025, 0.22), prior_alpha=1.2)),
    # dbpedia's published flat row is 0.8718 acc / 0.8218 f1
    # (results_dbpedia.csv:2,6,7); the r4 pin hits acc (0.876) but runs
    # f1 3.6 pts LOW (0.786) — the opposite tail profile from amazon.
    # More-uniform class priors raise tail recall; extra label noise
    # pulls accuracy back: chip-confirmed 0.8783/0.8168 (d_acc +0.65,
    # d_f1 -0.50 — both within a point of published).
    "dbpedia-f1": ("dbpedia", dict(prior_alpha=4.0, label_noise=0.05)),
}


def protocol_corpus(protocol: str = "amazon", n_docs: int = 50_000, seed: int = 0,
                    **overrides):
    """Corpus shaped like the reference's datasets, for protocol-scale runs.

    Returns ``(docs, level_labels, n_train, n_val)`` where ``level_labels``
    is ``[coarse, ..., fine]`` integer label arrays over all docs, laid out
    train-block-first like the reference CSVs (flat_amazon.py:42-63 concats
    train then test; DBpedia has an explicit val block between them —
    ``n_val`` is 0 for amazon, whose val split is drawn at run time).

    Document model: each token is background (global Zipf), a parent-topic
    word, or a child-topic word. Every child of a parent draws from the
    *same* parent word pool under a child-specific frequency ordering, so
    sibling discrimination rests on frequency profiles, not word identity —
    the confusable regime the published accuracies (0.599 on 43-class
    Amazon; results.csv:2-16) live in.

    The per-protocol parameter dict below is **calibrated so flat GCN lands
    in the reference's published accuracy band** (amazon ~0.60
    results.csv:2,6,7; dbpedia ~0.87 results_dbpedia.csv:2,6,7 — VERDICT
    r2 Weak #3 flagged the earlier dbpedia corpus as ceiling-easy at
    0.978); ``**overrides`` exposes every knob for calibration sweeps
    (experiments/calibrate_difficulty.py). ``label_noise`` relabels that
    fraction of documents with a fresh draw from the class prior (document
    text stays generated from the true class — mislabeled data, the real
    datasets' irreducible-error analogue), hierarchy-consistently.
    """
    rng = np.random.default_rng(seed + 7_777)
    if protocol in PROTOCOL_PROFILES:
        base, prof = PROTOCOL_PROFILES[protocol]
        merged = dict(prof)
        merged.update(overrides)  # explicit overrides beat the profile
        return protocol_corpus(base, n_docs=n_docs, seed=seed, **merged)
    if protocol not in PROTOCOL_CFGS:
        raise ValueError(f"unknown protocol {protocol!r}")
    cfg = dict(PROTOCOL_CFGS[protocol])
    unknown = set(overrides) - set(cfg)
    if unknown:
        raise TypeError(f"unknown protocol_corpus overrides: {sorted(unknown)}")
    cfg.update(overrides)
    levels = cfg["levels"]
    n_background, pool_size, bg_alpha = (
        cfg["n_background"], cfg["pool_size"], cfg["bg_alpha"]
    )
    mix, child_alpha = cfg["mix"], cfg["child_alpha"]
    log_len, sig_len, min_len, max_len = (
        cfg["log_len"], cfg["sig_len"], cfg["min_len"], cfg["max_len"]
    )
    n_train = int(round(n_docs * cfg["train_frac"]))
    n_val = int(round(n_docs * cfg["val_frac"]))

    # word surfaces are cheap integers-as-strings; CountVectorizer's \w+
    # tokenizer keeps them intact
    bg_words = np.array([f"bg{i:05d}" for i in range(n_background)])
    bg_p = _zipf_probs(n_background, bg_alpha)

    # label tree: child -> parent chains, ragged family sizes
    parent_of = []  # parent_of[level][class_at_level] -> class at level-1
    for li in range(1, len(levels)):
        parent_of.append(_ragged_split(levels[li], levels[li - 1], rng))

    # per-level topic pools. Levels 0..k-2: one dedicated pool per class at
    # that level, shared by all descendants, drawn under a class-specific
    # ordering at the level below. Final level: for amazon the children
    # *share* the parent pool with permuted Zipf ranks (confusable); for
    # dbpedia each leaf additionally owns a small dedicated vocabulary
    # (short docs, high accuracy — results_dbpedia.csv:2-7 is 0.871).
    pools = []
    for li, n_cls in enumerate(levels[:-1]):
        pools.append(
            [
                np.array([f"t{li}c{c:03d}w{j:03d}" for j in range(pool_size)])
                for c in range(n_cls)
            ]
        )
    n_leaf = levels[-1]
    leaf_parent = parent_of[-1]
    child_p = _zipf_probs(pool_size, child_alpha)
    # leaf-specific distribution over the parent's pool: the shared Zipf
    # base with a log-normal frequency tilt — sibling distributions overlap
    # heavily, so discrimination rests on aggregate frequency profiles
    leaf_tilt = cfg["leaf_tilt"]
    leaf_dists = []
    for _ in range(n_leaf):
        w = child_p * np.exp(leaf_tilt * rng.standard_normal(pool_size))
        leaf_dists.append(np.cumsum(w / w.sum()))
    leaf_vocab_size = int(cfg["leaf_vocab_size"])
    if leaf_vocab_size > 0:
        leaf_vocab = [
            np.array([f"leaf{c:03d}w{j:02d}" for j in range(leaf_vocab_size)])
            for c in range(n_leaf)
        ]
        leaf_vocab_p = _zipf_probs(leaf_vocab_size, 1.1)

    # cross-parent leaf aliasing (the per-label-gain dial, VERDICT r3 item
    # 3). The reference's flagship row — per-label 0.718 vs flat 0.599
    # (results.csv:2,14-16) — exists because eval_perlabel.py:73 routes by
    # GROUND-TRUTH Cat1: the +11.9-point gain is exactly the parent-
    # inference error flat pays and GT routing doesn't. Reproducing that
    # structure needs leaf evidence that separates siblings WITHIN a parent
    # while confusing leaves ACROSS parents: with probability
    # ``leaf_alias``, a leaf-topic token is drawn from an alias pool
    # indexed by the leaf's within-parent RANK, under one shared
    # distribution per rank — so same-rank leaves of different parents are
    # word-for-word indistinguishable on these tokens (zero parent signal),
    # while siblings (distinct ranks → disjoint pools) separate cleanly.
    leaf_alias = float(cfg["leaf_alias"])
    alias_tilt = cfg["alias_tilt"]
    rank_within = np.zeros(n_leaf, np.int64)
    for p_id in range(levels[-2]):
        members = np.flatnonzero(leaf_parent == p_id)
        rank_within[members] = np.arange(len(members))
    if leaf_alias > 0.0:
        n_ranks = int(rank_within.max()) + 1
        alias_words = np.array([f"alw{j:03d}" for j in range(pool_size)])
        # ONE shared alias vocabulary; each within-parent rank gets its own
        # tilted frequency profile over it (like leaf_dists, but indexed by
        # rank) — sibling discrimination stays frequency-profile-hard
        # (dialed by alias_tilt), cross-parent same-rank leaves identical
        tilt = leaf_tilt if alias_tilt is None else float(alias_tilt)
        rank_dists = []
        for _ in range(n_ranks):
            w = child_p * np.exp(tilt * rng.standard_normal(pool_size))
            rank_dists.append(np.cumsum(w / w.sum()))

    # class priors: uneven, like real category data. Lower ``prior_alpha``
    # concentrates mass on few leaves — rare-class recall collapses and
    # macro-F1 drops well below accuracy, the signature of the reference's
    # published rows (flat 0.599 acc vs 0.424 f1, results.csv:2)
    leaf_prior = rng.dirichlet(np.full(n_leaf, float(cfg["prior_alpha"])))

    # inverse-CDF samplers (rng.choice with p= rebuilds the CDF per call)
    bg_cum = np.cumsum(bg_p)
    child_cum = np.cumsum(child_p)
    # per-class token-kind mixture: with tail_tilt > 0, class c's leaf-topic
    # share scales by (p_c / p_max)^tail_tilt and the slack moves to
    # background — rare classes carry weaker evidence, so tail recall (and
    # macro-F1) falls while head-dominated accuracy barely moves: the
    # reference's acc >> f1 signature (results.csv flat 0.599 acc/0.424 f1).
    # At 0.0 every row below is bitwise the flat mix (r4 stream pin holds).
    tail_tilt = float(cfg["tail_tilt"])
    tail_scope = str(cfg["tail_scope"])
    if tail_scope not in ("global", "parent"):
        raise ValueError(f"tail_scope must be 'global' or 'parent', "
                         f"got {tail_scope!r}")
    n_leaf_mix = levels[-1]
    mix_arr = np.asarray(mix, np.float64)
    if tail_tilt > 0.0:
        # 'global': rescale by the globally most frequent class. 'parent':
        # rescale by each class's WITHIN-PARENT head sibling, so every
        # parent keeps one full-evidence child (parent inference and
        # GT-routed accuracy hold) while subordinate siblings weaken —
        # macro-F1 falls in the per-label frame too, the published
        # acc >> f1 per-label profile (results.csv:12-16).
        if tail_scope == "parent":
            ref = np.empty(n_leaf_mix)
            for p in np.unique(leaf_parent):
                m = leaf_parent == p
                ref[m] = leaf_prior[m].max()
        else:
            ref = np.full(n_leaf_mix, leaf_prior.max())
        g_mix = (leaf_prior / ref) ** tail_tilt
    else:
        g_mix = np.ones(n_leaf_mix)
    mix_cums = np.empty((n_leaf_mix, len(mix)))
    for c in range(n_leaf_mix):
        m = mix_arr.copy()
        m[-1] = mix_arr[-1] * g_mix[c]
        m[0] = mix_arr[0] + mix_arr[-1] * (1.0 - g_mix[c])
        mix_cums[c] = np.cumsum(m)
    if leaf_vocab_size > 0:
        leaf_cum = np.cumsum(leaf_vocab_p)

    docs = []
    leaf_label = np.searchsorted(np.cumsum(leaf_prior), rng.random(n_docs)).clip(
        0, n_leaf - 1
    )
    lengths = np.clip(
        np.exp(rng.normal(log_len, sig_len, n_docs)).astype(int), min_len, max_len
    )
    for i in range(n_docs):
        leaf = int(leaf_label[i])
        chain = [leaf]  # classes at levels k-1 .. 0
        for po in reversed(parent_of):
            chain.append(int(po[chain[-1]]))
        chain = chain[::-1]  # level 0 .. k-1
        length = int(lengths[i])
        kind = np.searchsorted(mix_cums[leaf], rng.random(length)).clip(
            0, len(mix) - 1)
        words = np.empty(length, dtype=object)
        m0 = kind == 0
        if m0.any():
            idx = np.searchsorted(bg_cum, rng.random(int(m0.sum())))
            words[m0] = bg_words[idx.clip(0, n_background - 1)]
        for li in range(len(levels) - 1):
            m = kind == (1 + li)
            if m.any():
                pool = pools[li][chain[li]]
                idx = np.searchsorted(child_cum, rng.random(int(m.sum())))
                words[m] = pool[idx.clip(0, pool_size - 1)]
        m = kind == len(mix) - 1
        if m.any():
            if leaf_vocab_size > 0:
                idx = np.searchsorted(leaf_cum, rng.random(int(m.sum())))
                words[m] = leaf_vocab[leaf][idx.clip(0, len(leaf_vocab_p) - 1)]
            elif leaf_alias > 0.0:
                mi = np.flatnonzero(m)
                take_alias = rng.random(len(mi)) < leaf_alias
                ai = mi[take_alias]
                if len(ai):
                    # rank-indexed profile over the SHARED alias pool:
                    # same-rank leaves across parents draw identically —
                    # no parent signal in these tokens
                    dist = rank_dists[int(rank_within[leaf])]
                    idx = np.searchsorted(dist, rng.random(len(ai)))
                    words[ai] = alias_words[idx.clip(0, pool_size - 1)]
                pi = mi[~take_alias]
                if len(pi):
                    pool = pools[-1][int(leaf_parent[leaf])]
                    idx = np.searchsorted(leaf_dists[leaf], rng.random(len(pi)))
                    words[pi] = pool[idx.clip(0, pool_size - 1)]
            else:
                pool = pools[-1][int(leaf_parent[leaf])]
                idx = np.searchsorted(leaf_dists[leaf], rng.random(int(m.sum())))
                words[m] = pool[idx.clip(0, pool_size - 1)]
        docs.append(" ".join(words.tolist()))

    # mislabeling noise, drawn AFTER text generation so the document stream
    # is identical across label_noise settings (calibration comparability);
    # the recorded chain stays hierarchy-consistent (ancestors recomputed
    # from the noisy leaf)
    noise = float(cfg["label_noise"])
    if noise > 0.0:
        flip = rng.random(n_docs) < noise
        leaf_label = leaf_label.copy()
        leaf_label[flip] = np.searchsorted(
            np.cumsum(leaf_prior), rng.random(int(flip.sum()))
        ).clip(0, n_leaf - 1)

    level_labels = []
    for li in range(len(levels)):
        lab = leaf_label.copy()
        for po in reversed(parent_of[li:]):
            lab = po[lab]
        level_labels.append(lab.astype(np.int64))
    return docs, level_labels, n_train, n_val
