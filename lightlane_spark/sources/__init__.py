"""Sources: parquet/CSV/Hive-text/JDBC readers returning DataFrames."""
