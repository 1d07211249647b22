"""Prefilled-state checkpointing: persist a ShadowCache to disk.

The reference never saves its {U, SV, landmarks} state — every process
pays the full prefill (SVD + landmark scan) again (SURVEY.md §5.4 notes
this as the natural new capability for the rebuild, explicitly not a
parity requirement). Here the entire prefilled cache pytree round-trips
through one ``.npz`` file, so a 122K-token context that took tens of
seconds to prefill resumes in the time it takes to read the file.

Format: a single uncompressed npz whose entries are the cache's array
leaves (bfloat16 stored as a uint16 view — numpy can't serialize
ml_dtypes directly) plus a ``__meta__`` JSON header carrying the static
``ShadowLayout`` geometry, per-leaf dtypes, the engine variant that
wrote the file, and the host V-store contents when the cache was
offloaded. The V store is interchangeable across engine variants at
load time: ``v_to`` decides whether it lands on device (HBM modes) or
stays a numpy array for the caller to commit to pinned host memory —
never staged through device HBM, which would OOM at exactly the scales
offload exists for.
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from shadowkv_tpu.cache.shadow import ShadowCache, ShadowLayout

_FORMAT_VERSION = 2

# Array leaves of ShadowCache (everything except the static layout),
# derived from the dataclass so the two can never diverge.
_ARRAY_FIELDS = tuple(
    f.name
    for f in dataclasses.fields(ShadowCache)
    if f.name != "layout"
)


def _encode(arr) -> tuple[np.ndarray, str]:
    """numpy-serializable view + the logical dtype name."""
    a = np.asarray(arr)
    name = str(a.dtype)
    if name == "bfloat16":
        return a.view(np.uint16), name
    return a, name


def _decode_np(a: np.ndarray, name: str) -> np.ndarray:
    if name == "bfloat16":
        import ml_dtypes

        a = a.view(ml_dtypes.bfloat16)
    return a


def _decode(a: np.ndarray, name: str) -> jnp.ndarray:
    return jnp.asarray(_decode_np(a, name))


def save_shadow_state(
    cache: ShadowCache, path: str, v_store=None, variant: str = "hbm"
):
    """Write a prefilled (or mid-generation) ShadowCache to ``path``.

    ``v_store`` is the engine's HostVStore when the cache runs in
    io_callback offload mode (its rows live on the host, outside the
    pytree). ``variant`` records which engine wrote the file
    ('hbm' | 'ring' | 'io_callback') — informational; loads are
    cross-compatible.
    """
    entries: dict[str, np.ndarray] = {}
    dtypes: dict[str, str] = {}
    for f in _ARRAY_FIELDS:
        val = getattr(cache, f)
        if val is None:
            continue
        entries[f], dtypes[f] = _encode(val)
    meta = {
        "version": _FORMAT_VERSION,
        "layout": dataclasses.asdict(cache.layout),
        "dtypes": dtypes,
        "variant": variant,
        "offload": v_store is not None,
    }
    if v_store is not None:
        entries["__vstore_rows__"], meta["vstore_dtype"] = _encode(
            v_store.rows
        )
        meta["vstore_shape"] = list(v_store.shape)
    entries["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    with open(path, "wb") as fh:
        np.savez(fh, **entries)


def load_shadow_state(path: str, v_to: str = "device"):
    """Read a checkpoint back into (ShadowCache, v_numpy | None).

    ``v_to``:
    - 'device': the full V store lands in the cache's ``v_full`` leaf
      (device memory); returns (cache, None).
    - 'numpy': ``v_full`` becomes a zero-chunk placeholder and the V
      store is returned as a host numpy array in the checkpoint's
      store layout, WITHOUT staging it through device memory — the
      caller commits it to pinned host memory (ring/fused offload) or
      a HostVStore (io_callback offload).

    Either works on any checkpoint: the store is recovered from the
    ``v_full`` leaf (hbm/ring saves) or the ``__vstore_rows__`` entry
    (io_callback saves).
    """
    assert v_to in ("device", "numpy"), v_to
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        assert meta["version"] == _FORMAT_VERSION, (
            f"checkpoint format {meta['version']} != {_FORMAT_VERSION}"
        )
        layout = ShadowLayout(**meta["layout"])
        fields = {}
        for f in _ARRAY_FIELDS:
            if f not in z.files:
                fields[f] = None
            elif f == "v_full":
                fields[f] = _decode_np(z[f], meta["dtypes"][f])
            else:
                fields[f] = _decode(z[f], meta["dtypes"][f])
        # Recover the V store as numpy, whichever entry holds it.
        v_np = fields["v_full"]
        if meta.get("offload"):
            assert v_np is not None and v_np.shape[3] == 0, (
                "io_callback checkpoint should carry a placeholder "
                "v_full"
            )
            v_np = _decode_np(
                z["__vstore_rows__"], meta["vstore_dtype"]
            ).reshape(meta["vstore_shape"])
    if v_to == "device":
        fields["v_full"] = jnp.asarray(v_np)
        host_v = None
    else:
        shape = v_np.shape
        fields["v_full"] = jnp.zeros(
            shape[:3] + (0,) + shape[4:], jnp.asarray(v_np[:0]).dtype
        )
        host_v = v_np
    return ShadowCache(layout=layout, **fields), host_v
