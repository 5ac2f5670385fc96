"""Sources: testdata parquet loading, TSV/CSV geo ingest, synthetic bulk."""
