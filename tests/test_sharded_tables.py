"""idx-sharded FM tables (ops/fmindex_tpu.sharded_tables).

Every device kernel reaches the checkpoint lines / sampled SA through
_fetch_lines/_fetch_sa; under the sharded_tables context those become
shard-local gathers + psum merges, so the SAME kernel bodies run under a
shard_map with the tables sharded over an `idx` mesh axis (the pangenome
layout, SURVEY.md section 5).  Outputs must be bit-equal to the
unsharded kernels.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bwamem_tpu.engine.fmindex import FMIndex
from bwamem_tpu.index.build import build_index
from bwamem_tpu.ops import fmindex_tpu as fmt
from bwamem_tpu.ops.fmindex_tpu import (
    DeviceFMIndex, occ4_device, sa_lookup_body,
)
from bwamem_tpu.utils.fasta import Fasta, FastaContig

N_IDX = 4


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, 50_000).astype(np.uint8)
    idx = build_index(Fasta([FastaContig("c", "", codes)]), sa_intv=8)
    fm = FMIndex(idx)
    dfm = DeviceFMIndex.from_host(fm)
    devs = np.array(jax.devices("cpu")[:N_IDX]).reshape(N_IDX)
    mesh = Mesh(devs, ("idx",))
    lines_np = np.asarray(dfm.lines)
    sa_np = np.asarray(dfm.sa)
    bps = -(-lines_np.shape[0] // N_IDX)
    sps = -(-sa_np.shape[0] // N_IDX)
    lines_pad = np.zeros((bps * N_IDX, lines_np.shape[1]), np.uint32)
    lines_pad[: lines_np.shape[0]] = lines_np
    sa_pad = np.zeros(sps * N_IDX, sa_np.dtype)
    sa_pad[: sa_np.shape[0]] = sa_np
    lines_s = jax.device_put(lines_pad, NamedSharding(mesh, P("idx", None)))
    sa_s = jax.device_put(sa_pad, NamedSharding(mesh, P("idx")))
    return fm, dfm, mesh, lines_s, sa_s, bps, sps


def test_occ4_sharded_bit_equal(setup):
    fm, dfm, mesh, lines_s, sa_s, bps, sps = setup
    rng = np.random.default_rng(4)
    ks = jnp.asarray(rng.integers(-1, fm.seq_len + 1, 512).astype(np.int32))
    want = np.asarray(
        occ4_device(dfm.lines, dfm.L2, ks, dfm.primary, dfm.seq_len,
                    dfm.span)
    )
    with fmt.sharded_tables("idx", bps, sps):
        got = shard_map(
            lambda l, L, k: occ4_device(
                l, L, k, dfm.primary, dfm.seq_len, dfm.span
            ),
            mesh=mesh,
            in_specs=(P("idx", None), P(), P()),
            out_specs=P(),
        )(lines_s, dfm.L2, ks)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_sa_lookup_sharded_bit_equal(setup):
    fm, dfm, mesh, lines_s, sa_s, bps, sps = setup
    rng = np.random.default_rng(5)
    rows = jnp.asarray(rng.integers(0, fm.seq_len, 512).astype(np.int32))
    want = np.asarray(
        sa_lookup_body(
            dfm.lines, dfm.L2, dfm.sa, rows, dfm.primary, fm.seq_len,
            dfm.sa_intv, dfm.span,
        )
    )
    with fmt.sharded_tables("idx", bps, sps):
        got = shard_map(
            lambda l, L, s, k: sa_lookup_body(
                l, L, s, k, dfm.primary, fm.seq_len, dfm.sa_intv, dfm.span
            ),
            mesh=mesh,
            in_specs=(P("idx", None), P(), P("idx"), P()),
            out_specs=P(),
        )(lines_s, dfm.L2, sa_s, rows)
    np.testing.assert_array_equal(np.asarray(got), want)
    # host-oracle anchor
    np.testing.assert_array_equal(
        want, fm.sa_lookup(np.asarray(rows, np.int64))
    )
