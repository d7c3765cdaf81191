"""Character-n-gram language identification — the first filter of every
real LLM-data pipeline, replacing the r4 3-marker-word demo (r4 VERDICT #2).

The classic Cavnar–Trenkle shape (n-gram profile ranking, "N-Gram-Based Text
Categorization", 1994 — public method): each language has a profile of its
most frequent character trigrams; a document is scored against every profile
and takes the argmax. Everything here is 100% columnar and oracle-exact:

* **Profiles are inline constants** (computed at import time from the seed
  corpus below — a few hundred words of original sample text per language;
  function-word trigrams like ``" th"``/``"der"``/``" de"`` dominate, which
  is precisely the Cavnar–Trenkle observation). Weights are INTEGERS
  (``PROFILE_SIZE - rank``), so scores are integer sums — bit-identical
  across Spark and DuckDB, no float drift.
* **Normalization** is the same expression in both engines:
  ``lower`` → collapse every non-``[a-z]`` run to one space → trim → pad
  with one leading/trailing space (so word-boundary trigrams like ``" th"``
  and ``"he "`` exist). Accented letters normalize to spaces — deterministic
  in both engines, and the remaining ASCII function-word trigrams carry the
  signal.
* **Plan shape (the 100 TB path)**: trigram positions come from one
  ``sequence`` + ``explode`` (linear in text size), the profile table —
  ``N_LANGS × PROFILE_SIZE`` rows, a few KB — is a **broadcast** equi-join
  on the trigram, and the per-language scores are map-side-combinable
  conditional sums in ONE ``groupBy(doc_id)``. A final left join against the
  doc universe keeps zero-match docs, classified ``'und'`` (undetermined).
  One shuffle on ``doc_id``; no UDF, no window, no cross join.

Scale note: the per-doc trigram fan-out is len(text) rows into a broadcast
hash join — at 100 TB this is the same shape as the MinHash shingle explode
(the engine's most-tested pattern); the groupBy collapses it map-side before
the only exchange.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

PROFILE_SIZE = 120

# Original seed sentences (written for this module — generic everyday prose;
# umlauts/accents intentionally present: they normalize to spaces exactly as
# real text would). A few hundred words per language is enough because the
# top-ranked trigrams are function-word fragments, which are stable across
# any text of the language (Cavnar–Trenkle §3).
SEEDS: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and then the dog runs "
        "away with the ball because it wants to play in the park where the "
        "children are waiting for their friends to come and join the game "
        "that they started this morning when the sun was rising over the "
        "hills and the birds were singing in the old trees near the river "
        "people in the city walk to the market every day and they buy bread "
        "and cheese and fruit from the sellers who know them by name because "
        "they have been coming to the same place for many years and the "
        "weather in the north is cold in the winter but the summer days are "
        "long and warm and everyone goes to the lake to swim and to rest "
        "she said that she would read the book before the end of the week "
        "and then write a letter to her brother about the things she had "
        "learned from it and about the questions that were still open"
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und dann "
        "läuft der hund mit dem ball weg weil er im park spielen will wo die "
        "kinder auf ihre freunde warten die kommen und an dem spiel "
        "teilnehmen das sie heute morgen begonnen haben als die sonne über "
        "den hügeln aufging und die vögel in den alten bäumen am fluss sangen "
        "die menschen in der stadt gehen jeden tag zum markt und sie kaufen "
        "brot und käse und obst von den händlern die sie beim namen kennen "
        "weil sie seit vielen jahren an denselben ort kommen und das wetter "
        "im norden ist im winter kalt aber die sommertage sind lang und warm "
        "und alle gehen an den see um zu schwimmen und sich auszuruhen "
        "sie sagte dass sie das buch vor dem ende der woche lesen würde und "
        "dann ihrem bruder einen brief über die dinge schreiben wollte die "
        "sie daraus gelernt hatte und über die fragen die noch offen waren"
    ),
    "es": (
        "el zorro marrón rápido salta sobre el perro perezoso y luego el "
        "perro se escapa con la pelota porque quiere jugar en el parque donde "
        "los niños esperan a sus amigos para venir y unirse al juego que "
        "empezaron esta mañana cuando el sol salía sobre las colinas y los "
        "pájaros cantaban en los árboles viejos cerca del río "
        "la gente de la ciudad camina al mercado todos los días y compran pan "
        "y queso y fruta de los vendedores que los conocen por su nombre "
        "porque llevan muchos años viniendo al mismo lugar y el tiempo en el "
        "norte es frío en invierno pero los días de verano son largos y "
        "cálidos y todos van al lago a nadar y a descansar "
        "ella dijo que leería el libro antes del final de la semana y que "
        "luego escribiría una carta a su hermano sobre las cosas que había "
        "aprendido de él y sobre las preguntas que seguían abiertas"
    ),
    "fr": (
        "le renard brun rapide saute par dessus le chien paresseux et puis le "
        "chien part avec la balle parce qu il veut jouer dans le parc où les "
        "enfants attendent leurs amis pour venir et rejoindre le jeu qu ils "
        "ont commencé ce matin quand le soleil se levait sur les collines et "
        "que les oiseaux chantaient dans les vieux arbres près de la rivière "
        "les gens de la ville vont au marché tous les jours et ils achètent "
        "du pain et du fromage et des fruits aux vendeurs qui les connaissent "
        "par leur nom parce qu ils viennent au même endroit depuis des années "
        "et le temps dans le nord est froid en hiver mais les jours d été "
        "sont longs et chauds et tout le monde va au lac pour nager et se "
        "reposer elle a dit qu elle lirait le livre avant la fin de la "
        "semaine et qu elle écrirait ensuite une lettre à son frère sur les "
        "choses qu elle avait apprises et sur les questions encore ouvertes"
    ),
    "it": (
        "la volpe marrone veloce salta sopra il cane pigro e poi il cane "
        "scappa con la palla perché vuole giocare nel parco dove i bambini "
        "aspettano i loro amici per venire e unirsi al gioco che hanno "
        "iniziato questa mattina quando il sole sorgeva sulle colline e gli "
        "uccelli cantavano sugli alberi vecchi vicino al fiume "
        "la gente della città va al mercato tutti i giorni e compra pane e "
        "formaggio e frutta dai venditori che li conoscono per nome perché "
        "vengono nello stesso posto da molti anni e il tempo nel nord è "
        "freddo in inverno ma i giorni d estate sono lunghi e caldi e tutti "
        "vanno al lago per nuotare e riposare "
        "lei ha detto che avrebbe letto il libro prima della fine della "
        "settimana e che poi avrebbe scritto una lettera a suo fratello sulle "
        "cose che aveva imparato e sulle domande ancora aperte"
    ),
}

LANGS = sorted(SEEDS)


def _normalize_py(text: str) -> str:
    """Python twin of the columnar normalization (profile building + tests)."""
    import re

    collapsed = re.sub(r"[^a-z]+", " ", text.lower()).strip()
    return f" {collapsed} "


def _trigrams_py(text: str) -> list[str]:
    t = _normalize_py(text)
    return [t[i : i + 3] for i in range(len(t) - 2)] if len(t) >= 3 else []


def _build_profiles() -> list[tuple[str, str, int]]:
    """(trigram, lang, weight) rows; weight = PROFILE_SIZE - rank, rank by
    (count desc, trigram asc) — fully deterministic."""
    rows: list[tuple[str, str, int]] = []
    for lang in LANGS:
        counts = Counter(_trigrams_py(SEEDS[lang]))
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (g, _cnt) in enumerate(ranked[:PROFILE_SIZE]):
            rows.append((g, lang, PROFILE_SIZE - rank))
    return rows


PROFILES: list[tuple[str, str, int]] = _build_profiles()


def normalize_text(col) -> Column:
    """Columnar normalization — identical SQL: see :func:`oracle_norm_sql`."""
    return F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace(F.lower(col), "[^a-z]+", " ")),
        F.lit(" "),
    )


def profiles_df(spark: SparkSession) -> DataFrame:
    """Profile constants as a DataFrame, built with ONE ``spark.sql`` VALUES
    statement — a pure-JVM LocalRelation. Not ``createDataFrame(list)``,
    whose python-RDD scan cold-starts a python worker per task just to
    deserialize the rows (the same pitfall measured in operators/skew.py);
    and not a per-element ``F.struct(F.lit(...))`` literal array (the r5
    form), whose 600 structs cost ~4 s of py4j round trips at DataFrame
    CONSTRUCTION time — measured in OPTIMIZATION_r06.md; the VALUES parse
    is one JVM call. Trigrams are ``[a-z ]`` only by construction, safe to
    single-quote."""
    values = ", ".join(f"('{g}', '{lang}', {w})" for g, lang, w in PROFILES)
    return spark.sql(f"SELECT col1 AS g, col2 AS lang, col3 AS w FROM VALUES {values}")


def classify_language(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, predicted) for every input doc; ``'und'`` when no profile trigram
    matches (empty/NULL/non-Latin text). See module docstring for the plan
    shape — one broadcast join + one doc-keyed groupBy."""
    spark = docs.sparkSession
    norm = docs.select(id_col, normalize_text(F.col(text_col)).alias("t"))
    # explode a position range and substring per position (whole-stage
    # codegen) instead of materializing a per-doc trigram ARRAY through an
    # interpreted transform() lambda (r6; same fix as the MinHash shingle
    # explode — identical rows). The when-guard keeps sequence() ascending:
    # sequence(1, 0) would emit a DESCENDING [1, 0], not an empty range.
    pos = norm.select(
        id_col,
        "t",
        F.explode(
            F.when(
                F.length("t") >= 3, F.sequence(F.lit(1), F.length("t") - 2)
            ).otherwise(F.array().cast("array<int>"))
        ).alias("_i"),
    )
    grams = pos.select(id_col, F.substring(F.col("t"), F.col("_i"), F.lit(3)).alias("g"))
    scored = grams.join(F.broadcast(profiles_df(spark)), "g")
    per = scored.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.col("lang") == lang, F.col("w")).otherwise(0))
            .cast("long")
            .alias(f"s_{lang}")
            for lang in LANGS
        ]
    )
    base = docs.select(id_col).join(per, id_col, "left")
    scores = {lang: F.coalesce(F.col(f"s_{lang}"), F.lit(0)) for lang in LANGS}
    # argmax with alphabetical tie-break: first lang whose score >= all others
    chain = None
    for lang in LANGS:
        cond = None
        for other in LANGS:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        branch = (chain.when if chain is not None else F.when)(cond, F.lit(lang))
        chain = branch
    pred = F.when(
        F.greatest(*[scores[lang] for lang in LANGS]) == 0, F.lit("und")
    ).otherwise(chain.otherwise(F.lit("und")))
    return base.select(id_col, pred.alias("predicted"))


# ---------------------------------------------------------------------------
# DuckDB oracle fragments (the driver's cross-engine gate)
# ---------------------------------------------------------------------------


def profile_values_sql() -> str:
    """The profile constants as a SQL VALUES list (trigrams are [a-z ] only
    by construction — safe to single-quote)."""
    return ", ".join(f"('{g}', '{lang}', {w})" for g, lang, w in PROFILES)


def oracle_case_sql() -> str:
    """The identical argmax CASE chain, generated from the same LANGS list."""
    arms = []
    for lang in LANGS:
        conds = " AND ".join(
            f"s_{lang} >= s_{other}" for other in LANGS if other != lang
        )
        arms.append(f"WHEN {conds} THEN '{lang}'")
    greatest = ", ".join(f"s_{lang}" for lang in LANGS)
    return (
        f"CASE WHEN greatest({greatest}) = 0 THEN 'und' "
        + " ".join(arms)
        + " ELSE 'und' END"
    )
