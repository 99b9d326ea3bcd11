"""Declarative data-quality rule framework."""
