"""Relational + vector operators built on the DataFrame API."""
