"""Property-based tests for the round-6 operators: randomized corpora
through the real Spark operators vs pure-Python references. Examples kept
small (Spark per-example cost); the properties carry the coverage."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

token = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"])
doc_text = st.lists(token, min_size=0, max_size=20).map(" ".join)
corpus = st.dictionaries(st.integers(0, 30), doc_text, min_size=1, max_size=10)


@given(docs=corpus, chunk=st.integers(2, 8), ov_frac=st.integers(0, 1))
@SETTINGS
def test_chunk_documents_property(spark, docs, chunk, ov_frac):
    """Every token of every non-empty doc is covered by >= 1 chunk; chunk
    starts follow the stride grid; the final chunk reaches the doc end and
    no chunk is fully contained in its predecessor."""
    from pharmacodi_spark.text.corpus import chunk_documents

    overlap = (chunk - 1) * ov_frac  # 0 or max legal
    stride = chunk - overlap
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    rows = chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, text in docs.items():
        toks = [t for t in text.split() if t]
        ch = sorted(by_doc.get(i, []), key=lambda r: r.chunk_id)
        if not toks:
            assert not ch
            continue
        assert ch, (i, text)
        assert [c.start_token for c in ch] == [
             j * stride + 1 for j in range(len(ch))
        ]
        assert ch[-1].start_token + ch[-1].n_tokens - 1 == len(toks)
        covered = set()
        for c in ch:
            assert c.chunk_text == " ".join(
                toks[c.start_token - 1 : c.start_token - 1 + c.n_tokens]
            )
            covered |= set(range(c.start_token, c.start_token + c.n_tokens))
        assert covered == set(range(1, len(toks) + 1))


@given(docs=corpus, min_len=st.integers(2, 5))
@SETTINGS
def test_repeated_spans_property(spark, docs, min_len):
    """Spans agree with a brute-force reference: a token position is in a
    span iff it is covered by some length-min_len window whose token string
    occurs >= 2 times corpus-wide."""
    from pharmacodi_spark.text.dedup import repeated_spans

    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got: dict[int, set] = {}
    for r in repeated_spans(df, min_len=min_len).collect():
        got.setdefault(r.doc_id, set()).update(
            range(r.span_start, r.span_end + 1)
        )
        assert r.span_tokens == r.span_end - r.span_start + 1 >= min_len

    from collections import Counter

    win = Counter()
    toks_by_doc = {}
    for i, text in docs.items():
        toks = [t for t in text.split() if t]
        toks_by_doc[i] = toks
        for p in range(len(toks) - min_len + 1):
            win[tuple(toks[p : p + min_len])] += 1
    want: dict[int, set] = {}
    for i, toks in toks_by_doc.items():
        cov = set()
        for p in range(len(toks) - min_len + 1):
            if win[tuple(toks[p : p + min_len])] >= 2:
                cov |= set(range(p + 1, p + min_len + 1))
        if cov:
            want[i] = cov
    assert got == want


@given(docs=corpus, k=st.integers(1, 4))
@SETTINGS
def test_sample_per_group_property(spark, docs, k):
    """Per-group output size == min(k, group size); the sample is the k
    smallest md5 draws (replayed in Python)."""
    import hashlib

    from pharmacodi_spark.operators.sampling import sample_per_group

    rows = [(i, text, f"g{i % 3}") for i, text in docs.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string, g string")
    out = sample_per_group(df, "g", k, key_cols=["doc_id"], salt="p").collect()
    got: dict[str, set] = {}
    for r in out:
        got.setdefault(r.g, set()).add(r.doc_id)

    def draw(i):
        return int(hashlib.md5(f"p{i}".encode()).hexdigest()[:15], 16)

    groups: dict[str, list] = {}
    for i, _, g in rows:
        groups.setdefault(g, []).append(i)
    for g, ids in groups.items():
        want = set(sorted(ids, key=lambda i: (draw(i), i))[:k])
        assert got.get(g, set()) == want, (g, k)
