"""train_unigram_lm (text/tokenizer.py): bit-exact pure-Python replay of
seed → EM (integer Viterbi) → prune, plus coverage/size properties."""

from __future__ import annotations

from collections import Counter

from pharmacodi_spark.text.selection import ilog2_fp_int


def _py_train(texts, vocab_size, seed_size, max_piece_len, em_iters,
              prune_frac, max_word_len=32):
    """Independent sequential reference: same contract, different code
    shape (recursive-free DP, Counter-based counting)."""
    words = Counter()
    for t in texts:
        for w in t.split():
            if w:
                words[w[:max_word_len]] += 1

    subs = Counter()
    for w, c in words.items():
        for i in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - i) + 1):
                subs[w[i:i + l]] += c
    top = sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    counts = dict(top)
    for p, c in subs.items():
        if len(p) == 1:
            counts[p] = max(counts.get(p, 0), c)

    def logp(cnt):
        total = sum(cnt.values())
        d = ilog2_fp_int(total + len(cnt))
        return {p: ilog2_fp_int(c + 1) - d for p, c in cnt.items()}

    def segment(w, lp, max_len):
        dp = [None] * (len(w) + 1)
        dp[0] = (0, 0, ())
        for j in range(1, len(w) + 1):
            best = None
            for i in range(max(0, j - max_len), j):
                if dp[i] is None:
                    continue
                s = lp.get(w[i:j])
                if s is None:
                    continue
                cand = (dp[i][0] - s, dp[i][1] + 1, dp[i][2] + (w[i:j],))
                if best is None or cand < best:
                    best = cand
            dp[j] = best
        return dp[len(w)][2]

    def e_step(cnt):
        lp = logp(cnt)
        ml = max(len(p) for p in lp)
        used = Counter()
        for w, c in words.items():
            for piece in segment(w, lp, ml):
                used[piece] += c
        return used

    while True:
        for _ in range(em_iters):
            used = e_step(counts)
            counts = {p: used.get(p, 0) for p in counts
                      if len(p) == 1 or used.get(p, 0) > 0}
        if len(counts) <= vocab_size:
            break
        multi = sorted((p for p in counts if len(p) > 1),
                       key=lambda p: (counts[p], p))
        n_drop = min(len(multi), max(1, int(len(counts) * prune_frac)))
        n_drop = min(n_drop, len(counts) - vocab_size)
        if n_drop <= 0 or not multi:
            break
        for p in multi[:n_drop]:
            del counts[p]
    lp = logp(counts)
    return sorted(((p, c, lp[p]) for p, c in counts.items()),
                  key=lambda t: (-t[1], t[0]))


TEXTS = [
    "low lower lowest slow slower slowest",
    "new newer newest few fewer fewest",
    "low low lower slow slow slowest",
    "the newest lowest slowest few new low",
]


def test_unigram_lm_matches_python_replay(spark):
    from pharmacodi_spark.text.tokenizer import train_unigram_lm

    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               ["doc_id", "text"])
    kw = dict(vocab_size=24, seed_size=60, max_piece_len=6, em_iters=2,
              prune_frac=0.2)
    got = train_unigram_lm(df, **kw)
    want = _py_train(TEXTS, **kw)
    assert got == want


def test_unigram_lm_properties(spark):
    from pharmacodi_spark.text.tokenizer import train_unigram_lm

    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               ["doc_id", "text"])
    vocab = train_unigram_lm(df, vocab_size=20, seed_size=50,
                             max_piece_len=5, em_iters=1, prune_frac=0.25)
    pieces = {p for p, _, _ in vocab}
    # every character of the corpus survives (coverage guarantee)
    chars = {ch for t in TEXTS for w in t.split() for ch in w}
    assert chars <= pieces
    # multi-char pieces got pruned down toward the target
    assert len([p for p in pieces if len(p) > 1]) <= 20
    # log-probs are negative and ranked with counts
    assert all(lp < 0 for _, _, lp in vocab)
    counts = [c for _, c, _ in vocab]
    assert counts == sorted(counts, reverse=True)
    # useful pieces emerged: some multi-char subword with real mass
    assert any(len(p) > 1 and c > 1 for p, c, _ in vocab)
