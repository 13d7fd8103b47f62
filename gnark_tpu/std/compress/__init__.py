"""Compression gadgets (reference std/compress)."""
