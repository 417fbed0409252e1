"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The reference (tiny-ram-halo2) runs its test suite single-process on CPU; we
additionally validate multi-chip sharding by forcing 8 virtual XLA host
devices, mirroring how the driver dry-runs `__graft_entry__.dryrun_multichip`.
This must happen before `import jax` anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
