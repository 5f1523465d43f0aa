"""Deterministic fixtures for oracle-checked cascade/comparator queries."""
