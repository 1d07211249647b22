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
``ShadowLayout`` geometry, per-leaf dtypes, and the host V-store
contents when the cache was offloaded.
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from shadowkv_tpu.cache.shadow import ShadowCache, ShadowLayout

_FORMAT_VERSION = 1

# Array leaves of ShadowCache, in a fixed order (layout is static).
_ARRAY_FIELDS = (
    "u", "sv", "landmarks", "landmark_mask", "k_buf", "v_buf",
    "v_full", "cached_ids", "gen_len", "lm_scale",
)


def _encode(arr) -> tuple[np.ndarray, str]:
    """numpy-serializable view + the logical dtype name."""
    a = np.asarray(arr)
    name = str(a.dtype)
    if name == "bfloat16":
        return a.view(np.uint16), name
    return a, name


def _decode(a: np.ndarray, name: str) -> jnp.ndarray:
    if name == "bfloat16":
        import ml_dtypes

        a = a.view(ml_dtypes.bfloat16)
    return jnp.asarray(a)


def save_shadow_state(cache: ShadowCache, path: str, v_store=None):
    """Write a prefilled (or mid-generation) ShadowCache to ``path``.

    ``v_store`` is the engine's HostVStore when the cache runs in
    offload mode (its rows live on the host, not in the pytree).
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


def load_shadow_state(path: str):
    """Read a checkpoint back into (ShadowCache, host_v_rows | None).

    ``host_v_rows`` is the offloaded V store's row array (shaped
    [L, B, K, C, cs, Dh]) when the checkpoint was saved in offload
    mode; the caller rebuilds a HostVStore from it.
    """
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        assert meta["version"] == _FORMAT_VERSION, (
            f"checkpoint format {meta['version']} != {_FORMAT_VERSION}"
        )
        layout = ShadowLayout(**meta["layout"])
        fields = {}
        for f in _ARRAY_FIELDS:
            if f in z.files:
                fields[f] = _decode(z[f], meta["dtypes"][f])
            else:
                fields[f] = None
        host_v = None
        if meta.get("offload"):
            host_v = _decode(
                z["__vstore_rows__"], meta["vstore_dtype"]
            ).reshape(meta["vstore_shape"])
    return ShadowCache(layout=layout, **fields), host_v
