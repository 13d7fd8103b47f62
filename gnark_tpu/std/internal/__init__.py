"""Internal gadget support (reference std/internal)."""
