"""In-circuit proof verifiers (reference std/recursion)."""
