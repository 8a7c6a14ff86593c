"""aspseek_spark — a from-scratch PySpark-native URL-frontier + fetch scheduler.

Re-expresses the query/data-processing capabilities of ASPseek's indexing
robot (reference: janforman/aspseek, see SURVEY.md) as idiomatic PySpark:

- URL-seen set     → partitioned bloom filter over murmur3 URL hashes
                     (exact anti-join backstop), SURVEY.md §2.3 J1
- politeness queue → salted host repartitioning + window-ranked ordering,
                     SURVEY.md §2.5 W1
- robots.txt       → broadcast-joined rules table, SURVEY.md §2.2 F4
- crawl round      → one micro-batch (plans.crawl_round.run_round)
- state            → snapshot tables with atomic manifest commit
                     (Iceberg-style; parquet emulation), SURVEY.md §2.10

This is NOT a port: no code derives from the reference tree (which was an
empty mount at survey time); semantics follow BASELINE.json's north_star.
"""

__version__ = "0.1.0"
