import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("PYSPARK_PYTHON", "/root/.pyenv/shims/python3")
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", "/root/.pyenv/shims/python3")


@pytest.fixture(scope="session")
def spark():
    from kgflow.session import get_spark

    s = get_spark("kgflow-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def lexicon_pdf():
    from kgflow import synth

    return synth.make_lexicon(60, seed=7)


@pytest.fixture(scope="session")
def lexicon(spark, lexicon_pdf):
    from kgflow import synth

    return synth.lexicon_dataframes(spark, 60, seed=7)


@pytest.fixture(scope="session")
def transcripts(spark, lexicon_pdf):
    from kgflow import synth

    terms_pdf, _ = lexicon_pdf
    df = synth.transcripts(spark, n_turns=500, n_convs=30, lexicon_pdf=terms_pdf, seed=42)
    df = df.cache()
    df.count()
    return df
