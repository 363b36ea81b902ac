from __future__ import annotations

import struct

import pytest

from ncagg_spark.session import get_spark


def dt_i32_msg() -> bytes:
    """v1 little-endian signed-int32 HDF5 datatype message — shared by
    the hand-built binary fixtures so the byte layout lives ONCE."""
    return struct.pack("<BBBBI", 0x10, 0x08, 0, 0, 4) + struct.pack(
        "<HH", 0, 32
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="ncagg-tests",
        cpus=4,
        extra_conf={"spark.sql.shuffle.partitions": "4"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
