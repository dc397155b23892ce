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


def read_slice(dset, start: int, stop: int) -> np.ndarray:
    """dset[start:stop] for a 1-D chunked dataset, C++-decoded when possible."""
    stop = min(int(stop), dset.shape[0])
    start = int(start)
    if stop <= start:
        return dset[start:stop]
    try:
        chunks = dset.chunks
        if (chunks is None or len(dset.shape) != 1
                or dset.compression != "gzip" or dset.fletcher32
                or dset.scaleoffset is not None or not native.available()):
            return dset[start:stop]
        # the C++ path handles exactly deflate (+optional byte-shuffle);
        # any other filter in the pipeline (fletcher32 checksum trailers,
        # nbit, third-party codecs) would be silently treated as data
        pipeline = dset.id.get_create_plist()
        H5Z_DEFLATE, H5Z_SHUFFLE = 1, 2
        for i in range(pipeline.get_nfilters()):
            if pipeline.get_filter(i)[0] not in (H5Z_DEFLATE, H5Z_SHUFFLE):
                return dset[start:stop]
    except Exception:
        return dset[start:stop]
    chunk = chunks[0]
    itemsize = dset.dtype.itemsize
    c0, c1 = start // chunk, (stop - 1) // chunk
    raws = []
    for ci in range(c0, c1 + 1):
        filt, raw = dset.id.read_direct_chunk((ci * chunk,))
        if filt != 0:      # some filter was skipped for this chunk — bail
            return dset[start:stop]
        raws.append(raw)
    buf = native.inflate_batch(raws, chunk * itemsize, itemsize,
                               bool(dset.shuffle))
    flat = buf.reshape(-1).view(dset.dtype)
    off = start - c0 * chunk
    return np.array(flat[off: off + (stop - start)])
