"""Deterministic fixture synthesis (font, media render, interleaved corpus)."""
