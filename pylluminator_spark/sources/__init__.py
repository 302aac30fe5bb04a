"""Data sources: IDAT binary scan, sample sheets, manifest ETL."""
