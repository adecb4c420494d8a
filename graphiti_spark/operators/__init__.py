"""Relational operators of the KG-construction pipeline."""
