"""Driver for the spark-submit --py-files packaging smoke
(tests/test_submit_pyfiles.py): imports the engine FROM THE SHIPPED
ZIP (the test runs this with a scratch cwd and without the repo on
PYTHONPATH) and pushes a small synthetic corpus through the fused
triple factory — the north-rule deployment shape
(``spark-submit --py-files engine.zip driver.py``)."""

from pyspark.sql import SparkSession


def main() -> None:
    spark = SparkSession.builder.getOrCreate()
    import pyontutils_spark
    from pyontutils_spark.plans.pipeline import run_triple_factory
    from pyontutils_spark.synth.lexicon import make_lexicon
    from pyontutils_spark.synth.spark_gen import pages_df

    pages = pages_df(spark, 200)
    res = run_triple_factory(spark, pages, make_lexicon())
    n = res.triples.count()
    res.linked.unpersist()
    print(f"PYFILES_SMOKE_OK triples={n} "
          f"pkg={pyontutils_spark.__file__}")
    spark.stop()


if __name__ == "__main__":
    main()
