from __future__ import annotations

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyppi_spark.session import build_spark
from pyppi_spark.schema import TRANSCRIPTS
from pyppi_spark.datagen import gen_transcripts_pdf, gen_probes_pdf


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = build_spark("pyppi_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_pdf() -> pd.DataFrame:
    # ~40 conversations; Zipf sizes include singletons and a few long ones
    return gen_transcripts_pdf(40, seed=42)


@pytest.fixture(scope="session")
def tiny_df(spark, tiny_pdf):
    df = spark.createDataFrame(tiny_pdf, schema=TRANSCRIPTS)
    df.persist()
    df.count()
    return df


@pytest.fixture(scope="session")
def probes_pdf(tiny_pdf) -> pd.DataFrame:
    return gen_probes_pdf(tiny_pdf, seed=42, per_conv=5)


@pytest.fixture(scope="session")
def probes_df(spark, probes_pdf):
    from pyppi_spark.schema import PROBES

    return spark.createDataFrame(probes_pdf, schema=PROBES)
