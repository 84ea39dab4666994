"""Import smoke test — walk every module and import it (reference
analog: ``tests/import_test.py:7-20``)."""

from __future__ import annotations

import importlib
import pkgutil

import kgdata_ray


def test_import_every_module():
    failures = []
    for mod in pkgutil.walk_packages(kgdata_ray.__path__, "kgdata_ray."):
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # noqa: BLE001
            failures.append((mod.name, repr(e)))
    assert not failures, failures
