

class TestDistributedNtile:
    """distributed_ntile must be bit-exact with a global ntile for any
    bucket count, including N < buckets and heavy leading-column ties."""

    def _check(self, spark, rows, nb, order_cols):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from duckdb_hybrid_doc_search_spark.operators.relational import \
            distributed_ntile

        df = spark.createDataFrame(rows, "k int, v int")
        got = {
            (r.k, r.v): r.bucket
            for r in distributed_ntile(df, nb, order_cols).collect()
        }
        w = Window.orderBy(*order_cols)
        want = {
            (r.k, r.v): r.bucket
            for r in df.withColumn(
                "bucket", F.ntile(nb).over(w)
            ).collect()
        }
        assert got == want

    def test_unique_keys(self, spark):
        rows = [(i % 7, i) for i in range(100)]
        self._check(spark, rows, 8, ["k", "v"])

    def test_heavy_ties_on_leading_key(self, spark):
        rows = [(1, i) for i in range(50)] + [(2, i) for i in range(5)]
        self._check(spark, rows, 4, ["k", "v"])

    def test_fewer_rows_than_buckets(self, spark):
        rows = [(i, i) for i in range(3)]
        self._check(spark, rows, 8, ["k", "v"])

    def test_desc_order(self, spark):
        from pyspark.sql import functions as F

        rows = [(i % 5, i) for i in range(40)]
        self._check(spark, rows, 4, [F.desc("k"), F.asc("v")])
