"""Readers and writers: files, catalogs, JDBC-shaped, API ingestion."""
