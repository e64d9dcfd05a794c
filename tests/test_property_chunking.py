"""Property-based equivalence of chunk_sentences' relational greedy fold
against a pure-Python twin: for ANY document text and budget, the Spark
F.aggregate fold must assign every sentence to exactly the chunk the
sequential greedy algorithm picks (never splitting a sentence, opening a
new chunk exactly when the budget would overflow)."""

from hypothesis import HealthCheck, given, settings, strategies as st

from sparkplug_spark.operators import chunk_sentences, split_sentences

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

# sentences built from a tiny vocabulary with varying lengths and the
# full terminator set; adversarial value is in the LENGTH STRUCTURE
# (runs of long/short sentences around the budget), not the words
word = st.sampled_from(["alpha", "beta", "gamma", "delta", "x"])
sentence = st.lists(word, min_size=1, max_size=9).map(" ".join)
terminator = st.sampled_from([". ", "! ", "? "])


@st.composite
def document(draw):
    sents = draw(st.lists(sentence, min_size=1, max_size=8))
    terms = [draw(terminator) for _ in sents]
    return "".join(s + t for s, t in zip(sents, terms)).rstrip()


def _greedy_twin(sentences, budget):
    """Sequential greedy packing: (chunk_idx, n_sentences, n_tokens)."""
    chunks = []
    used = 0
    for s in sentences:
        c = len(s.split())
        if chunks and used + c <= budget:
            chunks[-1].append((s, c))
            used += c
        else:
            chunks.append([(s, c)])
            used = c
    return [
        (i, len(ch), sum(c for _, c in ch), " ".join(s for s, _ in ch))
        for i, ch in enumerate(ch for ch in chunks)
    ]


@settings(**_SETTINGS)
@given(text=document(), budget=st.integers(1, 14))
def test_chunk_fold_equals_sequential_greedy(spark, text, budget):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    # the twin consumes the SAME sentence segmentation the operator uses
    sents = [
        r["sentence"]
        for r in sorted(
            split_sentences(df).collect(), key=lambda r: r["sent_pos"]
        )
    ]
    got = sorted(
        (
            r["chunk_idx"],
            r["n_sentences"],
            r["n_chunk_tokens"],
            r["chunk_text"],
        )
        for r in chunk_sentences(df, chunk_tokens=budget).collect()
    )
    assert got == _greedy_twin(sents, budget)
