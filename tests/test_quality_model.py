"""Learned quality filter (operators/quality_model.py)."""

from aide_spark.operators.quality_model import (
    BIAS,
    N_BUCKETS,
    NEGATIVE,
    POSITIVE,
    WEIGHTS,
    _features_py,
    _hash_py,
    score_documents,
    score_py,
)

HELD_OUT_POSITIVE = [
    "the old clock in the hall strikes twice before noon every day",
    "engineers tested the new pump at the water treatment plant",
    "a quiet crowd watched the sunrise from the eastern ridge",
    "the bakery sells warm bread and honey on sunday mornings",
    "his grandfather taught him to repair shoes with simple tools",
    "the council voted to plant more trees along the main avenue",
]
HELD_OUT_NEGATIVE = [
    "wsad wsad tyui tyui wsad tyui wsad tyui wsad",
    "order pills order pills discount order pills fast order",
    "345 678 901 234 567 890 123 456 789 012",
    "login signup login signup forgot password login signup",
    "zxcq werv zxcq werv zxcq werv zxcq werv",
    "mega bonus mega bonus free cash mega bonus spins now",
]


def test_training_set_is_separated():
    for t in POSITIVE:
        assert score_py(t)[1] > 0, t
    for t in NEGATIVE:
        assert score_py(t)[1] <= 0, t


def test_held_out_accuracy():
    # unseen prose vs unseen junk: the subword trigrams carry it
    assert all(score_py(t)[1] > 0 for t in HELD_OUT_POSITIVE)
    assert all(score_py(t)[1] <= 0 for t in HELD_OUT_NEGATIVE)


def test_weights_are_quantized_and_bounded():
    assert len(WEIGHTS) == N_BUCKETS
    assert all(isinstance(w, int) for w in WEIGHTS)
    assert isinstance(BIAS, int)
    # milli-quantization keeps weights in a sane integer range
    assert all(abs(w) < 100_000 for w in WEIGHTS)


def test_hash_and_features_deterministic():
    assert _hash_py("the") == _hash_py("the")
    assert 0 <= _hash_py("anything") < N_BUCKETS
    # token + (len-2) trigrams per token
    assert len(_features_py("hello")) == 1 + 3
    assert _features_py("") == []
    assert _features_py("   !!!   ") == []


def test_spark_matches_python_twin(spark):
    rows = [
        (0, HELD_OUT_POSITIVE[0]),
        (1, HELD_OUT_NEGATIVE[0]),
        (2, ""),
        (3, None),
        (4, "Mixed CASE text, with punctuation! And numbers 42."),
    ]
    out = {
        r["doc_id"]: r
        for r in score_documents(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert len(out) == 5  # null/empty docs must not vanish
    for doc_id, text in rows:
        nf, sm = score_py(text or "")
        assert out[doc_id]["n_features"] == nf, doc_id
        assert out[doc_id]["score_milli"] == sm, doc_id
        assert out[doc_id]["label"] == ("keep" if sm > 0 else "junk")


def test_spark_plan_is_broadcast_join(spark):
    df = score_documents(
        spark.createDataFrame([(0, "some text")], "doc_id long, text string")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
