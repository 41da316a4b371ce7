

def test_backend_alive_cpu():
    """The subprocess probe succeeds on the CPU platform and fails fast on
    a nonexistent one."""
    from pyqg_generative_tpu.utils.health import backend_alive
    assert backend_alive(timeout=120.0, platform="cpu")
    assert not backend_alive(timeout=30.0, platform="nonexistent")
