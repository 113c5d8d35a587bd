"""gigaspark — a from-scratch PySpark-native crawl-frontier engine.

Re-expresses the capabilities of Gigablast's spider core
(deepankarsharma/open-source-search-engine; see SURVEY.md) as idiomatic
PySpark: DataFrame/Catalyst plans, Arrow-vectorized pandas UDFs, bucketed
partitioning by host-hash, bloom-segment URL-seen set, and a deterministic
virtual-clock politeness scheduler whose emitted crawl order is verified
against a pure-Python oracle simulator (tests/oracle_sim.py).

NOT a port: the reference's C++ LSM/UDP machinery (Rdb*, Msg*) maps onto
parquet snapshots + shuffle; citations in docstrings use the SURVEY.md §0
convention (``File.cpp::Symbol [U]`` = public-knowledge, unverifiable —
the reference checkout is empty in this sandbox).
"""

__version__ = "0.1.0"
