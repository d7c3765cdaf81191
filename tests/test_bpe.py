"""Learned BPE tokenizer (operators/bpe.py)."""

from pyspark.sql import functions as F

from aide_spark.operators.bpe import (
    EOW,
    MERGES,
    N_MERGES,
    bpe_token_counts,
    encode_expr,
    encode_py,
    token_count_expr,
)


def test_training_is_deterministic_and_learns_classic_merges():
    assert len(MERGES) == N_MERGES
    assert len(set(MERGES)) == len(MERGES)  # no duplicate merges
    pairs = set(MERGES)
    # the canonical high-frequency English merges must be in the table
    assert ("t", "h") in pairs
    assert ("i", "n") in pairs
    # an end-of-word merge learned (suffix modeling, Sennrich et al.)
    assert any(b.endswith(EOW) or b == EOW for _a, b in pairs)


def test_encode_py_reconstructs_word():
    for w in ["the", "thinking", "documents", "a", "zzz", ""]:
        syms = encode_py(w)
        assert "".join(syms) == w + EOW
        assert all(syms), w  # no empty symbols


def test_encode_py_merges_reduce_length():
    # seen vocabulary compresses well below character count
    assert len(encode_py("the")) == 1  # fully merged incl. end marker
    assert len(encode_py("reading")) < len("reading") + 1


def test_rank_order_chain_equals_greedy_reference():
    """The literal-replace chain must equal a reference greedy encoder
    that always applies the lowest-rank pair present (the GPT-2 loop)."""
    rank = {p: i for i, p in enumerate(MERGES)}

    def greedy(word):
        sym = list(word) + [EOW]
        while True:
            cands = [
                (rank[(sym[i], sym[i + 1])], i)
                for i in range(len(sym) - 1)
                if (sym[i], sym[i + 1]) in rank
            ]
            if not cands:
                return sym
            r, _ = min(cands)
            a, b = MERGES[r]
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out

    for w in [
        "the", "thinking", "eating", "international", "aaaa", "thethethe",
        "ing", "under", "standing", "documents", "q",
    ]:
        assert encode_py(w) == greedy(w), w


def test_spark_encode_matches_python(spark):
    words = ["the", "thinking", "documents", "xylophone", "a", "thethethe"]
    df = spark.createDataFrame([(w,) for w in words], "w string").select(
        "w",
        encode_expr(F.col("w")).alias("enc"),
        token_count_expr(encode_expr(F.col("w"))).alias("n"),
    )
    for r in df.collect():
        py = encode_py(r["w"])
        assert r["enc"] == "".join(f"<{s}>" for s in py), r["w"]
        assert r["n"] == len(py)


def test_doc_level_counts_and_null_safety(spark):
    rows = [
        (0, "the thinking reader"),
        (1, ""),
        (2, None),
        (3, "The THINKING reader!!"),  # normalization: same as doc 0
    ]
    out = {
        r["doc_id"]: r
        for r in bpe_token_counts(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert len(out) == 4
    expect = sum(len(encode_py(w)) for w in ["the", "thinking", "reader"])
    assert out[0]["n_words"] == 3 and out[0]["n_bpe_tokens"] == expect
    assert out[3]["n_bpe_tokens"] == expect
    assert out[1]["n_words"] == 0 and out[1]["n_bpe_tokens"] == 0
    assert out[2]["n_words"] == 0 and out[2]["n_bpe_tokens"] == 0
