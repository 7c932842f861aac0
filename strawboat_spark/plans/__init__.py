"""Plan introspection helpers — make the 100 TB plan audit mechanical.

`explain("formatted")` output is the contract: these helpers parse it
so tests can assert the plan SHAPE (broadcast joins where intended,
filters pushed to the parquet scan, pruned read schemas, no cartesian
products) instead of eyeballing. See plans/audit.py.
"""
