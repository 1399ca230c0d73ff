"""Session conf behavior: the explicit shuffle-partitions pin must
survive apply_runtime_confs (ADVICE r2: registry query calls were
silently resetting it to the default)."""

from __future__ import annotations

from db_cdc_poc_spark.session import _SHUFFLE_PIN_CONF, apply_runtime_confs


def test_apply_runtime_confs_respects_pinned_shuffle_partitions(spark):
    before_pin = spark.conf.get(_SHUFFLE_PIN_CONF, None)
    before_val = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set(_SHUFFLE_PIN_CONF, "7")
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        apply_runtime_confs(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
        # without a pin, the default is applied
        spark.conf.unset(_SHUFFLE_PIN_CONF)
        apply_runtime_confs(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "32"
    finally:
        if before_pin is not None:
            spark.conf.set(_SHUFFLE_PIN_CONF, before_pin)
        spark.conf.set("spark.sql.shuffle.partitions", before_val)
