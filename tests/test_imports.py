"""Every module in the package imports cleanly (no dead imports, no
module-level regressions in constant derivation)."""

import importlib
import pkgutil

import algebra_tpu


def test_all_modules_import():
    failures = []
    for mod in pkgutil.walk_packages(
        algebra_tpu.__path__, prefix="algebra_tpu."
    ):
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # noqa: BLE001
            failures.append((mod.name, repr(e)))
    assert not failures, failures
