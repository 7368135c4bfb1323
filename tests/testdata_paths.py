"""Testdata scale-factor locations — the single source for test modules.

A plain helper module (not conftest): test files import these at collection
time, and importing conftest by module name couples them to pytest's
conftest bootstrapping (it breaks under ``--import-mode=importlib`` or if
tests/ ever gains an ``__init__.py``). conftest.py re-exports from here so
fixtures and tests share one definition.
"""

from __future__ import annotations

import os

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
