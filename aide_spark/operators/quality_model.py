"""Model-based document quality filter (the fastText/CCNet shape).

Real LLM-data pipelines follow the rule-based gates (Gopher repetition,
stopword ratios — operators/textmetrics.py) with a *learned* linear
filter: CCNet and the LLaMA corpus both score pages with a fastText
linear classifier over hashed bag-of-words + subword features (Joulin et
al. 2016, "Bag of Tricks for Efficient Text Classification" — public
method). This module is that operator, Spark-first and oracle-exact:

* **Features** are the hashing trick: every token AND every character
  trigram of the token (the fastText subword trick — unseen junk like
  keyboard mash still shares trigrams with trained junk) is hashed into
  ``N_BUCKETS`` buckets with a polynomial rolling hash that both Spark
  (``aggregate`` fold) and DuckDB (``list_reduce`` over a 0-prepended
  list) evaluate with identical integer arithmetic.
* **Weights are learned at import time** from the inline labeled corpus
  below (original prose positives, synthetic-junk negatives) by
  full-batch logistic-regression gradient descent — deterministic (zero
  init, fixed epochs/learning rate, L2), then quantized to integer
  milli-weights. Scores are therefore BIGINT sums: bit-identical across
  engines, no float drift.
* **Decision rule**: with n features and mean-normalized activation the
  logistic sign is ``sum(w[b(f)]) / n + bias > 0``, evaluated in exact
  integer form as ``score_milli = sum(w_int) + n * bias_int > 0``.

Plan shape (the 100 TB path): one explode (tokens × trigrams, linear in
text), one **broadcast** equi-join against the ``N_BUCKETS``-row literal
weight table (built as a JVM literal array explode — never
``createDataFrame(list)``, whose python-RDD scan cold-starts a worker
per task; see operators/lang_id.py:167), one map-side-combinable
``groupBy(doc_id)``, one left join back to the doc universe so
empty/null docs survive as ``junk``. One shuffle on ``doc_id``; no UDF,
no window.

Reference scope: the reference engine has no corpus-quality surface at
all (its validators are per-PDF structural gates,
api/validators/pdf_validator.py); this is part of the beyond-reference
LLM-data family (SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS = 256
HASH_MOD = 2_147_483_648  # 2^31: h*31+127 stays far inside BIGINT
WEIGHT_SCALE = 1000  # milli-weight quantization

# --------------------------------------------------------------------------
# Inline labeled corpus (original text written for this module).
# Positives: everyday English prose. Negatives: the junk classes a crawl
# actually serves — keyboard mash, token repetition, SEO keyword stuffing,
# number/symbol soup, lorem-ipsum filler, navigation-menu fragments.
# --------------------------------------------------------------------------

POSITIVE: list[str] = [
    "the committee agreed to meet again next week to review the budget",
    "she walked along the river while the morning fog lifted slowly",
    "local farmers reported a strong harvest despite the dry summer",
    "the museum opened a new exhibition about early printing presses",
    "he explained how the engine converts heat into useful motion",
    "students gathered in the library to prepare for the final exam",
    "the recipe calls for two cups of flour and a pinch of salt",
    "after the storm passed the crew repaired the broken mast",
    "the mayor announced a plan to repave the oldest streets in town",
    "scientists measured the glacier again and found it had retreated",
    "the orchestra rehearsed the second movement until midnight",
    "travelers waited at the station as the evening train arrived late",
    "the garden needs water every morning during the hottest month",
    "her latest novel follows a family moving across the country",
    "the bridge was closed for repairs so we took the longer road",
    "volunteers sorted the donated books into neat labeled boxes",
    "the lecture covered the history of navigation before the compass",
    "a gentle rain fell over the valley as the market closed",
    "the report shows that reading habits changed over the decade",
    "they painted the old fence white before the festival began",
    "the doctor suggested more sleep and a short walk after dinner",
    "wind turbines along the coast supply power to nearby villages",
    "the carpenter measured the plank twice before the first cut",
    "children built small boats from paper and raced them in the stream",
]

NEGATIVE: list[str] = [
    "asdf qwer zxcv asdf hjkl qwer uiop zxcv mnbv asdf qwer",
    "click here click here click here buy now buy now click here",
    "cheap watches cheap watches best price cheap watches free shipping",
    "qqqq wwww eeee rrrr tttt yyyy uuuu iiii oooo pppp qqqq",
    "lorem ipsum dolor sit amet lorem ipsum dolor sit amet lorem",
    "home about contact login register home about contact sitemap",
    "777 4444 99999 12345 00000 88888 31337 55555 123456 9999",
    "casino bonus casino bonus free spins casino bonus jackpot now",
    "xxx zzz xxx zzz qqq xxx zzz qqq xxx zzz qqq xxx",
    "viagra cialis viagra cialis cheap pills viagra cialis order",
    "download crack keygen serial download crack keygen torrent",
    "kjhg fdsa poiu ytre mnbl kjhg fdsa poiu lkjh gfds",
    "best seo best seo top ranking best seo backlinks best seo",
    "aaaaaa bbbbbb aaaaaa cccccc aaaaaa bbbbbb dddddd aaaaaa",
    "terms privacy cookies terms privacy cookies terms privacy",
    "111 222 333 444 555 666 777 888 999 000 111 222 333",
    "zxzx cvcv zxzx cvcv bnbn zxzx cvcv bnbn zxzx cvcv",
    "subscribe newsletter subscribe newsletter unsubscribe subscribe",
    "qwerty uiop qwerty uiop asdfgh jkl qwerty uiop zxcvbn",
    "win money win money fast cash win money no deposit win money",
    "page 1 page 2 page 3 page 4 page 5 page 6 page 7 page 8",
    "hjkl hjkl yuio yuio hjkl yuio hjkl yuio hjkl yuio hjkl",
    "free download free download full version free download now",
    "rty fgh vbn rty fgh vbn rty fgh vbn rty fgh vbn",
]


def _normalize_py(text: str) -> str:
    import re

    return re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()


def _hash_py(feature: str) -> int:
    h = 0
    for c in feature:
        h = (h * 31 + ord(c)) % HASH_MOD
    return h % N_BUCKETS


def _features_py(text: str) -> list[int]:
    """Bucket ids: one per token plus one per character trigram of each
    token — the Python twin of the columnar feature expression."""
    out: list[int] = []
    for tok in _normalize_py(text).split():
        if not tok:
            continue
        out.append(_hash_py(tok))
        for i in range(len(tok) - 2):
            out.append(_hash_py(tok[i : i + 3]))
    return out


def _train() -> tuple[list[int], int]:
    """Deterministic full-batch logistic regression over the inline corpus:
    zero init, fixed lr/epochs, L2 — no randomness anywhere. Returns
    (integer milli-weights per bucket, integer milli-bias)."""
    import numpy as np

    texts = POSITIVE + NEGATIVE
    y = np.array([1.0] * len(POSITIVE) + [0.0] * len(NEGATIVE))
    X = np.zeros((len(texts), N_BUCKETS))
    for r, t in enumerate(texts):
        feats = _features_py(t)
        for b in feats:
            X[r, b] += 1.0
        X[r] /= max(len(feats), 1)  # mean-normalized activations

    w = np.zeros(N_BUCKETS)
    b = 0.0
    lr, lam = 2.0, 1e-3
    for _ in range(600):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g / len(texts) + lam * w)
        b -= lr * float(g.mean())
    w_int = [int(round(v * WEIGHT_SCALE)) for v in w]
    return w_int, int(round(b * WEIGHT_SCALE))


WEIGHTS, BIAS = _train()


def score_py(text: str) -> tuple[int, int]:
    """(n_features, score_milli) — Python twin used by tests."""
    feats = _features_py(text)
    return len(feats), sum(WEIGHTS[b] for b in feats) + len(feats) * BIAS


# --------------------------------------------------------------------------
# Columnar implementation
# --------------------------------------------------------------------------


def normalize_text(col) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def _rolling_bucket(feature: Column) -> Column:
    """polyhash31(feature) % N_BUCKETS as one JVM fold — identical
    arithmetic to the DuckDB ``list_reduce`` twin (oracle_bucket_sql)."""
    return (
        F.aggregate(
            F.split(feature, ""),
            F.lit(0).cast("long"),
            lambda h, c: (h * 31 + F.ascii(c)) % HASH_MOD,
        )
        % N_BUCKETS
    )


def _feature_array(tokens: Column) -> Column:
    """tokens + per-token char trigrams, flattened (the fastText subword
    expansion) — one nested ``transform``, still a single projection."""
    trigrams = lambda w: F.when(  # noqa: E731
        F.length(w) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(w) - 2),
            lambda i: F.substring(w, i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.flatten(
        F.transform(tokens, lambda w: F.concat(F.array(w), trigrams(w)))
    )


def weights_df(spark: SparkSession) -> DataFrame:
    """(bucket, w) literal table — ONE ``spark.sql`` VALUES statement (a
    pure-JVM LocalRelation, broadcast at the join site). The r5 per-element
    ``F.struct(F.lit(...))`` form paid one py4j round trip per literal at
    DataFrame construction (~1 s for 128 rows; see OPTIMIZATION_r06.md)."""
    values = ", ".join(f"({i}, {w})" for i, w in enumerate(WEIGHTS))
    return spark.sql(f"SELECT col1 AS bucket, col2 AS w FROM VALUES {values}")


def score_documents(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_features BIGINT, score_milli BIGINT, label STRING) for every
    input doc. ``label`` is ``'keep'`` iff ``score_milli > 0``; docs with
    zero features (empty/null/non-alnum text) score 0 → ``'junk'``."""
    spark = docs.sparkSession
    toks = F.filter(
        F.split(normalize_text(F.col(text_col)), " "),
        lambda w: F.length(w) > 0,
    )
    feats = docs.select(
        id_col, F.explode(_feature_array(toks)).alias("feature")
    ).withColumn("bucket", _rolling_bucket(F.col("feature")))
    per = (
        feats.join(F.broadcast(weights_df(spark)), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum("w").cast("long").alias("wsum"),
        )
    )
    base = docs.select(id_col).join(per, id_col, "left")
    n = F.coalesce(F.col("n_features"), F.lit(0)).cast("long")
    score = (F.coalesce(F.col("wsum"), F.lit(0)) + n * BIAS).cast("long")
    return base.select(
        F.col(id_col),
        n.alias("n_features"),
        score.alias("score_milli"),
        F.when(score > 0, F.lit("keep")).otherwise(F.lit("junk")).alias("label"),
    )


# --------------------------------------------------------------------------
# DuckDB oracle fragments
# --------------------------------------------------------------------------


def weight_values_sql() -> str:
    return ", ".join(f"({i}, {w})" for i, w in enumerate(WEIGHTS))


def oracle_bucket_sql(feature_expr: str) -> str:
    """The identical rolling hash: 0-prepended list_reduce fold ≡ Spark's
    aggregate-with-init (DuckDB's list_reduce has no init parameter)."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({feature_expr}, ''), "
        "c -> CAST(ascii(c) AS BIGINT))), "
        f"(h, c) -> (h * 31 + c) % {HASH_MOD}) % {N_BUCKETS}"
    )
