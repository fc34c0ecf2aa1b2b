"""DataFrame-level operators mirroring the reference's query machinery.

- merge.py      — sorted-merge/vertical dedup (querier.go:536-1056)
- intervals.py  — tombstone-interval algebra (tombstones.go:237-304)
- windows.py    — ordered per-series iteration: lookback buffer, seek
                  (tsdbutil/buffer.go, querier.go:879-1164)
- postings.py   — materialized inverted-index path for high-cardinality
                  matchers (index/postings.go, querier.go:326-489)
"""
