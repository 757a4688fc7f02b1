"""Property test: the prefix-filtered Jaccard join equals a pure-Python
brute force over ALL pairs (stronger than equality with the plain
inverted-index join — the brute force cannot share a candidate-
generation bug) for random corpora and thresholds, including the
exact-threshold and tiny-doc boundary cases fixtures miss."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hipipe_spark.operators.dedup import ngram_jaccard_prefix_pairs

_SET = settings(max_examples=10, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])

# tiny alphabet -> heavy token sharing, hub tokens, exact-dup sets
tok_st = st.text(alphabet="ab", min_size=1, max_size=2)
doc_st = st.lists(tok_st, min_size=0, max_size=8)
corpus_st = st.lists(doc_st, min_size=2, max_size=10)


def _brute(corpus, t):
    sets = [set(d) for d in corpus]
    out = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            union = sets[i] | sets[j]
            if not union:
                continue
            jac = len(sets[i] & sets[j]) / len(union)
            if jac >= t:
                out.add((i, j, round(jac, 9)))
    return out


@_SET
@given(corpus=corpus_st,
       t=st.sampled_from([0.25, 0.5, 0.55, 2 / 3, 0.75, 0.9, 1.0]))
def test_prefix_jaccard_equals_brute_force(spark, corpus, t):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
        "doc_id long, text string")
    got = {(r.id_a, r.id_b, round(r.jaccard, 9))
           for r in ngram_jaccard_prefix_pairs(df, threshold=t).collect()}
    assert got == _brute(corpus, t)
