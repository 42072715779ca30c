"""Native (C++) runtime tests: build, ring buffer semantics, RobotState
codec roundtrip, image ingest correctness vs numpy, and a threaded
producer/consumer smoke test."""

import threading

import numpy as np
import pytest

from wild_visual_navigation_tpu.runtime.native_ipc import (
    RingBuffer,
    RobotStateCodec,
    image_to_chw,
    load_native,
)


def test_native_library_builds():
    lib = load_native()
    assert lib is not None, "libwvn_native.so failed to build (g++ is expected in this image)"


def test_robot_state_codec_roundtrip():
    codec = RobotStateCodec()
    pose = np.arange(7, dtype=np.float64) * 0.1
    twist = np.arange(6, dtype=np.float64)
    desired = np.arange(6, dtype=np.float64) + 10
    buf = codec.pack(123.456, pose, twist, desired, seq=42, flags=3)
    assert len(buf) == codec.record_size
    stamp, p, t, d, seq, flags = codec.unpack(buf)
    assert stamp == 123.456 and seq == 42 and flags == 3
    np.testing.assert_array_equal(p, pose)
    np.testing.assert_array_equal(t, twist)
    np.testing.assert_array_equal(d, desired)


def test_ring_buffer_fifo_and_overflow():
    rb = RingBuffer(record_size=8, capacity=4, overwrite=False)
    for i in range(4):
        assert rb.push(i.to_bytes(8, "little"))
    assert not rb.push((99).to_bytes(8, "little"))  # full
    assert len(rb) == 4
    for i in range(4):
        assert int.from_bytes(rb.pop(), "little") == i
    assert rb.pop() is None
    assert rb.dropped >= 1


def test_ring_buffer_overwrite_policy():
    rb = RingBuffer(record_size=8, capacity=2, overwrite=True)
    for i in range(10):
        assert rb.push(i.to_bytes(8, "little"))
    # freshest records survive
    vals = []
    while (v := rb.pop()) is not None:
        vals.append(int.from_bytes(v, "little"))
    assert vals[-1] == 9
    assert all(v >= 6 for v in vals)


def test_ring_buffer_threaded():
    codec = RobotStateCodec()
    rb = RingBuffer(codec.record_size, capacity=128, overwrite=False)
    N = 500
    received = []

    def producer():
        for i in range(N):
            buf = codec.pack(float(i), np.zeros(7), np.zeros(6), np.zeros(6), seq=i)
            while not rb.push(buf):
                pass

    def consumer():
        while len(received) < N:
            b = rb.pop()
            if b is not None:
                received.append(codec.unpack(b)[4])

    tp = threading.Thread(target=producer)
    tc = threading.Thread(target=consumer)
    tp.start(); tc.start()
    tp.join(timeout=10); tc.join(timeout=10)
    assert received == list(range(N))


def test_image_ingest_matches_numpy():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(48, 64, 3), dtype=np.uint8)
    out = image_to_chw(img)
    ref = img.astype(np.float32).transpose(2, 0, 1) / 255.0
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_image_ingest_fused_resize():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(64, 64, 3), dtype=np.uint8)
    out = image_to_chw(img, 32, 32)
    assert out.shape == (3, 32, 32)
    iy = np.arange(32) * 64 // 32
    ref = (img.astype(np.float32) / 255.0)[iy][:, iy].transpose(2, 0, 1)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_u8_ingest_and_resize():
    from wild_visual_navigation_tpu.runtime.native_ipc import image_to_chw_u8

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(48, 64, 3), dtype=np.uint8)
    out = image_to_chw_u8(img)
    np.testing.assert_array_equal(out, img.transpose(2, 0, 1))
    small = image_to_chw_u8(img, 24, 32)
    assert small.shape == (3, 24, 32) and small.dtype == np.uint8
    iy = np.arange(24) * 48 // 24
    ix = np.arange(32) * 64 // 32
    np.testing.assert_array_equal(small, img[iy][:, ix].transpose(2, 0, 1))
