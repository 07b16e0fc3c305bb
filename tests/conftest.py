import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_web_crawler_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_1k(spark, tmp_path_factory):
    """Shared 1,000-page corpus (FIXTURES.md unit-test size)."""
    from distributed_web_crawler_spark.fixtures.corpus import CorpusSpec
    from distributed_web_crawler_spark.sources.corpus_source import build_corpus

    spec = CorpusSpec(n=1000)
    path = str(tmp_path_factory.mktemp("corpus1k") / "corpus")
    build_corpus(spark, spec, path, slices=8)
    return spec, path
