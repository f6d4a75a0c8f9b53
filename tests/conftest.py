from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from process_alphafold3_outputs_spark import fixtures  # noqa: E402
from process_alphafold3_outputs_spark.session import get_spark  # noqa: E402

# Import-time driver-window guard: ANY pytest invocation (even a single
# unrelated file) fails fast when the driver-visible registry exceeds the
# correctness window. A silent overflow voided the entire round-5 driver
# run; queries() now truncates gracefully, so this is the loud failure.
import __spark_entry__ as _entry  # noqa: E402

_visible = _entry.visible_count()
if _visible > _entry._DRIVER_WINDOW:  # pragma: no cover - guard
    raise RuntimeError(
        f"{_visible} driver-visible queries exceed the "
        f"{_entry._DRIVER_WINDOW}-query driver window; add the overflow "
        f"to _DEFERRED in __spark_entry__.py"
    )

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("af3spark-tests", cpus=int(os.environ.get("TEST_CPUS", "4")))
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def corpus():
    return fixtures.make_corpus(n_jobs=20, seed=7)


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory, corpus) -> str:
    out = str(tmp_path_factory.mktemp("af3corpus"))
    for name, df in corpus.items():
        df.to_parquet(os.path.join(out, f"{name}.parquet"), index=False)
    return out


@pytest.fixture(scope="session")
def af3(spark, corpus_dir):
    return {
        name: spark.read.parquet(os.path.join(corpus_dir, f"{name}.parquet"))
        for name in ("predictions", "chains", "pae_long", "atoms")
    }
