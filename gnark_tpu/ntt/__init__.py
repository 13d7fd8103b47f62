import functools

from gnark_tpu.ntt.domain import Domain


@functools.lru_cache(maxsize=32)
def _domain_cached(field_name: str, n: int) -> Domain:
    from gnark_tpu.ff import get_ff
    return Domain(get_ff(field_name), n)


def get_domain(ff, n: int) -> Domain:
    """Process-cached Domain: the twiddle/coset precomputations are
    seconds of host big-int work at 2^20 — rebuilding them per prove
    call (as `Domain(ff, n)` does) dominates small proves."""
    return _domain_cached(ff.p.name, n)


__all__ = ["Domain", "get_domain"]
