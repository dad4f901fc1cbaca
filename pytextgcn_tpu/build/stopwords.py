"""English stopword lists.

The reference removes nltk's English stopwords before building the vocabulary
(/root/reference/textgcn/lib/text2graph.py:84-86,130). This environment has no
network access for ``nltk.download``, so the standard NLTK English list (179
entries) is baked in verbatim; the tokenizer used downstream splits on ``\\w+``
so the apostrophe forms ("you're", ...) can never match a token, but they are
kept for exact set parity with the reference's behavior.
"""

NLTK_ENGLISH_STOPWORDS = frozenset(
    """
    i me my myself we our ours ourselves you you're you've you'll you'd your
    yours yourself yourselves he him his himself she she's her hers herself it
    it's its itself they them their theirs themselves what which who whom this
    that that'll these those am is are was were be been being have has had
    having do does did doing a an the and but if or because as until while of
    at by for with about against between into through during before after
    above below to from up down in out on off over under again further then
    once here there when where why how all any both each few more most other
    some such no nor not only own same so than too very s t can will just don
    don't should should've now d ll m o re ve y ain aren aren't couldn
    couldn't didn didn't doesn doesn't hadn hadn't hasn hasn't haven haven't
    isn isn't ma mightn mightn't mustn mustn't needn needn't shan shan't
    shouldn shouldn't wasn wasn't weren weren't won won't wouldn wouldn't
    """.split()
)


def get_stopwords(kind="nltk"):
    """Return a stopword set. ``kind``: 'nltk' (reference parity), 'sklearn'
    (the 318-word list used by the reference's MLP baselines via
    ``TfidfVectorizer(stop_words='english')``, mlp_helper.py:38), or None."""
    if kind is None:
        return None
    if kind == "nltk":
        # Prefer a real nltk corpus if one is installed locally; fall back to
        # the baked-in copy (identical content for standard installs).
        try:
            from nltk.corpus import stopwords as _sw

            return frozenset(_sw.words("english"))
        except Exception:
            return NLTK_ENGLISH_STOPWORDS
    if kind == "sklearn":
        from sklearn.feature_extraction.text import ENGLISH_STOP_WORDS

        return frozenset(ENGLISH_STOP_WORDS)
    raise ValueError(f"unknown stopword kind: {kind!r}")
