"""Source readers: files (csv/json/parquet/avro/...), JDBC, API."""
