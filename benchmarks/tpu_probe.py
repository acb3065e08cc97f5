"""Fast TPU-availability probe: exits 0 iff the axon backend initializes
and executes one trivial dispatch.  Used to gate the (expensive, xl-sized)
acceptance/bench runs while the remote tunnel is flapping — backend init
against a down tunnel stalls ~25 minutes before erroring, so the probe is
run under a short external timeout:

    timeout 120 python benchmarks/tpu_probe.py && python benchmarks/acceptance.py ...
"""
import sys


def main():
    import jax
    import jax.numpy as jnp
    if jax.default_backend() != "tpu":
        print(f"backend: {jax.default_backend()} (no TPU)", file=sys.stderr)
        return 1
    val = float(jnp.sum(jnp.ones(8)))
    print(f"tpu ok: {jax.devices()[0].device_kind} sum={val}")
    return 0 if val == 8.0 else 1


if __name__ == "__main__":
    sys.exit(main())
