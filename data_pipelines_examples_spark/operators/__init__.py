"""Relational, window, interval, dedup, similarity and text operators."""
