"""Bigram-LM perplexity scoring (operators/lm.py)."""

import math

from context_aware_rag_spark.operators import lm


def _py_scores(texts, alpha=0.5):
    """Independent pure-Python replication of the bigram LM."""
    docs = {i: t.strip().lower().split() for i, t in enumerate(texts)}
    pairs = {i: list(zip(w, w[1:])) for i, w in docs.items()}
    c_big, c_ctx, vocab = {}, {}, set()
    for w in docs.values():
        vocab.update(w)
    for ps in pairs.values():
        for p in ps:
            c_big[p] = c_big.get(p, 0) + 1
            c_ctx[p[0]] = c_ctx.get(p[0], 0) + 1
    out = {}
    V = len(vocab)
    for i, ps in pairs.items():
        if not ps:
            continue
        lp = sum(
            int(round(math.log((c_big[p] + alpha) / (c_ctx[p[0]] + alpha * V)) * 1e6))
            for p in ps
        )
        out[i] = (len(ps), lp, round(math.exp(-(lp / 1e6) / len(ps)), 4))
    return out


def test_bigram_lm_matches_python(spark):
    texts = [
        "the cat sat on the mat",
        "the cat sat on the hat",
        "a dog ran",
        "zzz",  # single token -> no bigrams -> absent
        "the the the the",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r.doc_id: (r.n_bigrams, r.logprob_micro, r.ppl)
        for r in lm.bigram_lm_scores(df).collect()
    }
    assert got == _py_scores(texts)


def test_repeated_text_scores_lower_ppl(spark):
    # ten copies of one sentence vs one unique sentence: the repeated
    # text's bigrams dominate the counts, so its perplexity is lower
    rows = [(i, "alpha beta gamma delta") for i in range(10)]
    rows.append((99, "omega psi chi phi"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    ppl = {r.doc_id: r.ppl for r in lm.bigram_lm_scores(df).collect()}
    assert ppl[0] < ppl[99]


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "b c d")], ["doc_id", "text"])
    plan = lm.bigram_lm_scores(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
