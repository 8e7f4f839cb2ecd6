"""Operational CLI for the parquet lake (`python -m
data_engineering_spark.admin <subcommand>`): inventory, compaction,
footer stats and checkpoint introspection — the runbook commands an
operator reaches for between pipeline runs."""
