"""B14 analogue of the reference's INSTALL/LOAD (README.md:53-56): the
engine is a pip-installable package, not a repo-root-only import."""

from __future__ import annotations

import pathlib
import tomllib


def test_version_matches_pyproject():
    import duckdb_cluster_hash_spark as d

    pyproject = tomllib.loads(
        (pathlib.Path(__file__).parents[1] / "pyproject.toml").read_text()
    )
    assert pyproject["project"]["version"] == d.__version__
    assert pyproject["project"]["name"] == "duckdb-cluster-hash-spark"


def test_package_exports_load_surface():
    import duckdb_cluster_hash_spark as d

    # the extension-LOAD analogue: one call registers the SQL surface
    assert callable(d.register_all)
    for name in d.__all__:
        assert getattr(d, name, None) is not None, name
