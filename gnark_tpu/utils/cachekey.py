"""Stable persistent-compile-cache keys for Pallas/Mosaic programs.

jax's persistent compilation cache strips debug locations from the
StableHLO before hashing (cache_key._canonicalize_ir), so ordinary jit
programs get stable keys across source edits. Pallas TPU kernels do
NOT: the Mosaic module is embedded as serialized MLIR bytecode inside
the `tpu_custom_call` backend_config, and that inner module carries
its own source locations — so ANY line shift in a file that defines a
pallas kernel churns every cache key that includes it. This is what
made each round's driver-run bench recompile for minutes over the
axon tunnel (BENCH_r03/r04 `*_timeout` sentinels; VERDICT r4 Weak #1).

`install()` monkeypatches jax._src.cache_key._canonicalize_ir to also
parse each tpu_custom_call body (MLIR bytecode, unregistered dialects
allowed — the same parse Mosaic itself performs in
jax._src.tpu_custom_call._lower_mosaic_module_to_asm), run
strip-debuginfo on it, and re-serialize deterministically before
hashing. Verified: a pallas kernel shifted by N source lines now
produces an identical cache key. The real lowered module sent to the
compiler is untouched (we mutate a clone).

`setup_cache()` is the one-stop jax cache configuration used by
bench.py, __graft_entry__.py and tools/* — cache dir + thresholds +
the key fix.
"""

from __future__ import annotations

import base64
import io
import json
import os

_INSTALLED = False

CACHE_DIR = "/root/.cache/gnark_tpu_xla_tpu"


def _canon_mosaic_payloads(module) -> None:
    """Strip debug info from every tpu_custom_call Mosaic body of a
    (cloned) StableHLO module, in place. Best-effort: any failure
    leaves the op unmodified (key falls back to churning, never
    corrupts)."""
    from jax._src.lib.mlir import ir
    from jax._src.lib.mlir import passmanager as pm

    def visit(op):
        for region in op.regions:
            for block in region.blocks:
                for o in block.operations:
                    oo = o.operation
                    if oo.name == "stablehlo.custom_call":
                        try:
                            tgt = ir.StringAttr(
                                oo.attributes["call_target_name"]).value
                            if tgt != "tpu_custom_call":
                                continue
                            cfg = json.loads(ir.StringAttr(
                                oo.attributes["backend_config"]).value)
                            body = cfg["custom_call_config"]["body"]
                            raw = base64.b64decode(body)
                            with ir.Context() as ctx2:
                                ctx2.allow_unregistered_dialects = True
                                m2 = ir.Module.parse(raw)
                                pm.PassManager.parse(
                                    "builtin.module(strip-debuginfo)",
                                    context=ctx2).run(m2.operation)
                                buf = io.BytesIO()
                                m2.operation.write_bytecode(
                                    buf, desired_version=0)
                            cfg["custom_call_config"]["body"] = (
                                base64.b64encode(buf.getvalue()).decode())
                            with module.context:
                                oo.attributes["backend_config"] = (
                                    ir.StringAttr.get(
                                        json.dumps(cfg, sort_keys=True)))
                        except Exception:  # noqa: BLE001 — never break keys
                            pass
                    visit(oo)
    visit(module.operation)


def install() -> None:
    """Monkeypatch the jax cache-key canonicalizer (idempotent)."""
    global _INSTALLED
    if _INSTALLED:
        return
    from typing import cast as type_cast

    from jax._src import cache_key
    from jax._src.lib.mlir import ir
    from jax._src.lib.mlir import passmanager as pm

    def _canonicalize_ir(m_original, ignore_callbacks):
        with m_original.context:
            m = type_cast(ir.Module, m_original.operation.clone())
            pm.PassManager.parse(
                "builtin.module(strip-debuginfo)").run(m.operation)
            try:
                _canon_mosaic_payloads(m)
            except Exception:  # noqa: BLE001
                pass
            return cache_key._serialize_ir(m, ignore_callbacks)

    cache_key._canonicalize_ir = _canonicalize_ir
    _INSTALLED = True


def setup_cache(cache_dir: str | None = None):
    """Configure the jax persistent compile cache + stable keys and
    return the jax module."""
    import jax
    d = cache_dir or os.environ.get("GNARK_TPU_CACHE_DIR", CACHE_DIR)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    install()
    return jax
