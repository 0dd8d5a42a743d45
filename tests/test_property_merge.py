"""Property-based MERGE semantics: LakeTable last-write-wins vs a Python
dict model, over randomized batch sequences (hypothesis). Exceeds the
reference's golden-file-only strategy (SURVEY §5: 'no property-based
tests')."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ethereum_etl_spark.lake import LakeTable

SCHEMA = StructType([
    StructField("k", LongType(), False),
    StructField("v", StringType(), False),
    StructField("seq", LongType(), False),
])

# a batch = list of (key, value); keys from a small domain to force overlap
batch_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=12), st.text("abcdef", min_size=1, max_size=4)),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(batches=st.lists(batch_strategy, min_size=1, max_size=4), deletes=st.sets(st.integers(0, 12), max_size=3))
def test_merge_matches_dict_model(spark, tmp_path_factory, batches, deletes):
    root = str(tmp_path_factory.mktemp("prop") / "t")
    t = LakeTable.create(spark, root, SCHEMA, key=["k"], prune_col="k", partition_size=5)

    model: dict[int, str] = {}
    seq = 0
    for i, b in enumerate(batches):
        rows = []
        for k, v in b:
            rows.append((k, v, seq))
            seq += 1
        # model: within-batch later seq wins; batch overwrites stored
        for k, v, s in rows:
            model[k] = v
        is_last = i == len(batches) - 1
        dk = None
        dkc = None
        if is_last and deletes:
            dk = spark.createDataFrame([(k,) for k in deletes], "k long")
            dkc = ["k"]
            for k in deletes:
                model.pop(k, None)
            # deleted keys re-inserted if batch carries them (delete+upsert)
            for k, v, s in rows:
                if k in deletes:
                    model[k] = v
        t.merge_upsert(
            spark.createDataFrame(rows, SCHEMA),
            batch_id=f"b{i}",
            version_col="seq",
            delete_keys=dk,
            delete_key_cols=dkc,
        )

    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == model
