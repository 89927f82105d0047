"""Contract test for __spark_entry__._certification_order (r6 verdict ask
#8): the driver's correctness gate samples a PREFIX of queries() in dict
order, so the rotation contract is load-bearing — a refactor that silently
stops rotating would freeze driver-side certification coverage on the same
prefix forever.

Contract: never-certified names first, then oldest-green first, ties in
registration order. Pure unit test over synthetic artifacts (no Spark)."""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test",
        Path(__file__).resolve().parents[1] / "__spark_entry__.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def _write(tmp_path: Path, rnd: int, rows: dict) -> None:
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(rows))


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
RED = {"rows_match": False, "schema_match": True, "hash_match": False, "err": None}
ROWS_ONLY = {"rows_match": True, "schema_match": True, "hash_match": None, "err": None}


def test_never_certified_sort_first_then_oldest_green(tmp_path):
    mod = _entry_module()
    names = ["a", "b", "c", "d", "e"]
    _write(tmp_path, 1, {"b": GREEN, "d": GREEN})
    _write(tmp_path, 2, {"d": GREEN, "e": GREEN})
    order = mod._certification_order(artifact_dir=tmp_path, registry_names=names)
    # a, c never certified -> first (registration order); b green in r1 ->
    # before d, e green in r2; d before e only by... both r2: ties keep
    # registration order
    assert order == ["a", "c", "b", "d", "e"]


def test_red_rows_do_not_count_as_certified(tmp_path):
    mod = _entry_module()
    names = ["a", "b"]
    _write(tmp_path, 3, {"a": RED, "b": GREEN})
    order = mod._certification_order(artifact_dir=tmp_path, registry_names=names)
    assert order == ["a", "b"]  # a's red row leaves it never-certified


def test_rows_only_check_counts_as_certified(tmp_path):
    mod = _entry_module()
    names = ["a", "b"]
    # hash_match None = the weaker rows-only lane (non-SQL-expressible ops)
    _write(tmp_path, 2, {"a": ROWS_ONLY})
    order = mod._certification_order(artifact_dir=tmp_path, registry_names=names)
    assert order == ["b", "a"]


def test_latest_green_wins_across_rounds(tmp_path):
    mod = _entry_module()
    names = ["a", "b"]
    _write(tmp_path, 1, {"a": GREEN})
    _write(tmp_path, 2, {"b": GREEN})
    _write(tmp_path, 3, {"a": GREEN})
    order = mod._certification_order(artifact_dir=tmp_path, registry_names=names)
    assert order == ["b", "a"]  # a re-certified in r3 -> rotates to the back


def test_unknown_names_and_corrupt_artifacts_are_ignored(tmp_path):
    mod = _entry_module()
    names = ["a", "b"]
    _write(tmp_path, 1, {"ghost": GREEN, "b": GREEN})
    (tmp_path / "CORRECTNESS_r02.json").write_text("{not json")
    order = mod._certification_order(artifact_dir=tmp_path, registry_names=names)
    assert order == ["a", "b"]


def test_production_order_covers_whole_registry_exactly_once():
    mod = _entry_module()
    order = mod._certification_order()
    assert sorted(order) == sorted(mod.REGISTRY)
    assert len(order) == len(set(order))
