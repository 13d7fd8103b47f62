"""In-circuit commitment-scheme verifiers (reference std/commitments)."""
