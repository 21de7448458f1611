

class TestMadByGroup:
    def test_robustness_vs_stddev(self, spark):
        from kkbox_churn_prediction_spark.operators.winsorize import mad_by_group

        # 9 well-behaved values + one wild outlier
        rows = [("g", float(v)) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9]] + [("g", 1e6)]
        df = spark.createDataFrame(rows, "grp string, v double")
        out = mad_by_group(df, "v", "grp").collect()[0]
        # median of 1..9 + 1e6 is 5.5; deviations ~ 0.5..4.5 + huge
        assert out["median"] == 5.5
        # MAD ignores the outlier: median of |x-5.5| over the 10 values
        assert out["mad"] == 2.5
        assert abs(out["mad_scaled"] - round(2.5 * 1.4826, 6)) < 1e-9
        assert out["n"] == 10

    def test_approx_mode_close_to_exact(self, spark):
        from kkbox_churn_prediction_spark.operators.winsorize import mad_by_group

        rows = [("a", float(i % 97)) for i in range(2000)]
        df = spark.createDataFrame(rows, "grp string, v double")
        exact = mad_by_group(df, "v", "grp").collect()[0]
        approx = mad_by_group(df, "v", "grp", exact=False).collect()[0]
        assert abs(exact["mad"] - approx["mad"]) <= 1.0
