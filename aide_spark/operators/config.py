"""Bank configuration dimension + compatibility checks (S8/V10/J3).

The reference keeps a 3-row DynamoDB table (bank_configs.tf:4-31) consulted
via a multi-level cache (api/bank_config.py:21-111); as data it is a tiny
dimension — here a literal DataFrame that every join BROADCASTS. Fields per
api/bank_config.py:82-107 and the extractors' get_supported_capabilities().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CAPABILITIES = [
    "password_protected", "multi_page", "transactions",
    "account_metadata", "statement_period",
]

BANK_CONFIGS = [
    ("UNION", "Union Bank of India", "ACTIVE", 50, CAPABILITIES),
    ("CANARA", "Canara Bank", "ACTIVE", 50, CAPABILITIES),
    ("APGVB", "Andhra Pradesh Grameena Bank", "ACTIVE", 50, CAPABILITIES),
]


def bank_config_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        BANK_CONFIGS,
        "bank_id string, bank_name string, status string, "
        "max_file_size_mb int, capabilities array<string>",
    )


def list_available_banks(spark: SparkSession) -> DataFrame:
    """S8/O3: active banks sorted by name (bank_config.py:262-303)."""
    return (
        bank_config_df(spark)
        .where(F.col("status") == "ACTIVE")
        .select("bank_id", "bank_name", "capabilities")
        .orderBy("bank_name")
    )


def validate_bank_configuration(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """J3 upload-time gate (upload/handler.py:184-208): docs whose bank_id is
    an ACTIVE config pass; the rest are rejected. Broadcast left-semi/anti."""
    cfg = F.broadcast(
        bank_config_df(docs.sparkSession).where(F.col("status") == "ACTIVE")
    )
    accepted = docs.join(cfg.select("bank_id"), "bank_id", "left_semi")
    rejected = docs.join(cfg.select("bank_id"), "bank_id", "left_anti")
    return accepted, rejected


def compatibility_check(docs: DataFrame) -> DataFrame:
    """V10 (bank_config.py:305-343): size ≤ bank MaxFileSize AND
    (password required ⇒ 'password_protected' ∈ capabilities). Broadcast join
    + boolean expression; unknown bank_id ⇒ incompatible (the reference's
    exception path returns False)."""
    cfg = F.broadcast(
        bank_config_df(docs.sparkSession).withColumnRenamed("bank_id", "cfg_bank_id")
    )
    joined = docs.join(cfg, docs["bank_id"] == cfg["cfg_bank_id"], "left")
    compatible = (
        F.col("cfg_bank_id").isNotNull()
        & (F.col("declared_size_mb") <= F.col("max_file_size_mb"))
        & (
            ~F.coalesce(F.col("encrypted"), F.lit(False))
            | F.array_contains(F.col("capabilities"), "password_protected")
        )
    )
    return joined.select(
        "doc_id", "bank_id", F.coalesce(compatible, F.lit(False)).alias("compatible")
    )
