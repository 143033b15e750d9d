"""Shared pytest fixtures: one SparkSession per test run, fixture/golden
loaders. Shuffle partitions pinned small so plans are stable and fast on
the fixture-scale inputs; the engine itself sizes shuffles to cores
(session.get_spark)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

TESTS = Path(__file__).resolve().parent
DATA = TESTS / "fixtures" / "data"
GOLDEN = TESTS / "golden"


@pytest.fixture(scope="session")
def spark():
    from skosconverter_spark.session import get_spark

    s = get_spark(
        app_name="skosconverter-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s


def load_fixture_text(name: str) -> str:
    for ext in (".ttl", ".md"):
        p = DATA / f"{name}{ext}"
        if p.exists():
            return p.read_text(encoding="utf-8")
    raise FileNotFoundError(name)


def load_golden_json(fixture: str, filename: str):
    return json.loads((GOLDEN / fixture / filename).read_text(encoding="utf-8"))


def load_golden_bytes(fixture: str, filename: str) -> bytes:
    return (GOLDEN / fixture / filename).read_bytes()


def manifest():
    return json.loads((GOLDEN / "MANIFEST.json").read_text(encoding="utf-8"))


def ttl_fixture_names() -> list[str]:
    return sorted(
        n for n, m in manifest()["fixtures"].items() if m["kind"] == "ttl"
    )


def md_fixture_names() -> list[str]:
    return sorted(
        n for n, m in manifest()["fixtures"].items() if m["kind"] == "md"
    )
