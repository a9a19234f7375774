"""Storage-layout conventions: date-partitioned staging and latest-snapshot
resolution."""
