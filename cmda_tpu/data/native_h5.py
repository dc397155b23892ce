"""GIL-free HDF5 slice reads (SURVEY §2.9: C++ event-stream reader).

The reference decodes DSEC ``events.h5`` through h5py + hdf5plugin inside
DataLoader workers (reference mmseg/datasets/dsec.py:3-4,286-303). Here the
Python side touches only chunk *metadata* (``read_direct_chunk`` returns the
raw compressed bytes without filtering); the deflate + byte-shuffle filters
— where the decode CPU time goes — run in C++ worker threads with the GIL
released (cmda_tpu/native/ingest.cpp cmda_inflate_batch).

Falls back to plain h5py slicing for anything but contiguous-axis-0 gzip
chunks (other codecs, filter-masked chunks, missing toolchain).
"""
from __future__ import annotations

import numpy as np

from .. import native


def read_slice(dset, start: int, stop: int, lock=None) -> np.ndarray:
    """dset[start:stop] for a 1-D chunked dataset, C++-decoded when possible.

    ``lock`` (optional threading.Lock) serializes every libhdf5 call on the
    shared File handle: h5py's internal lock protects single calls, but a
    10k-iter run with 4 loader threads hammering one DatasetID surfaced a
    transient ``H5Dread_chunk`` RuntimeError (r5) — the raw-chunk fetches
    are microseconds (I/O + memcpy), so holding a per-dataset lock costs
    nothing while the expensive C++ inflate stays outside it. Any failure
    inside the fast path falls back to plain slicing rather than killing
    the run."""
    import contextlib
    guard = lock if lock is not None else contextlib.nullcontext()

    def plain():
        with guard:
            return dset[start:stop]

    stop = min(int(stop), dset.shape[0])
    start = int(start)
    if stop <= start:
        return plain()
    try:
        chunks = dset.chunks
        if (chunks is None or len(dset.shape) != 1
                or dset.compression != "gzip" or dset.fletcher32
                or dset.scaleoffset is not None or not native.available()):
            return plain()
        # the C++ path handles exactly deflate (+optional byte-shuffle);
        # any other filter in the pipeline (fletcher32 checksum trailers,
        # nbit, third-party codecs) would be silently treated as data
        pipeline = dset.id.get_create_plist()
        H5Z_DEFLATE, H5Z_SHUFFLE = 1, 2
        for i in range(pipeline.get_nfilters()):
            if pipeline.get_filter(i)[0] not in (H5Z_DEFLATE, H5Z_SHUFFLE):
                return plain()
    except Exception:
        return plain()
    chunk = chunks[0]
    itemsize = dset.dtype.itemsize
    c0, c1 = start // chunk, (stop - 1) // chunk
    try:
        raws = []
        with guard:
            for ci in range(c0, c1 + 1):
                filt, raw = dset.id.read_direct_chunk((ci * chunk,))
                if filt != 0:  # a filter was skipped for this chunk — bail
                    raise _FallbackToPlain
                raws.append(raw)
    except _FallbackToPlain:
        return plain()
    except RuntimeError:       # transient H5Dread_chunk failure (see above)
        return plain()
    buf = native.inflate_batch(raws, chunk * itemsize, itemsize,
                               bool(dset.shuffle))
    flat = buf.reshape(-1).view(dset.dtype)
    off = start - c0 * chunk
    return np.array(flat[off: off + (stop - start)])


class _FallbackToPlain(Exception):
    pass
