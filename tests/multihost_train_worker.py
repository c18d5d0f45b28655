"""Worker process for the multi-host TRAINING test.

Launched N times by tests/test_multihost_train.py with a shared coordinator
port; each instance initializes jax.distributed on the CPU backend (the
multi-process extension of the suite's fake-device strategy — SURVEY.md §4)
and runs the REAL ``train.loop.train`` over the global mesh: superbatch
assembly through ``put_host_local(..., batch_dim=1)``, gradient psum across
the process boundary, orbax multi-process save/resume.

Usage: python multihost_train_worker.py <port> <pid> <nprocs> <workdir>
<max_steps> <logdir_name> (the parent sets XLA_FLAGS to pick the
per-process device count; the logdir <workdir>/<logdir_name> is shared by
both processes like a pod's shared filesystem, so resume-from-latest
crosses the process boundary). The single-process REFERENCE arm runs
through this same script with nprocs=1 so both arms share an identical
environment — jax.distributed initialized, same compile-cache dir — and
the only variable is in-process vs cross-process (Gloo) collectives.
"""

import sys


def main() -> int:
    port, pid, nprocs, workdir, max_steps, logdir_name = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        int(sys.argv[5]), sys.argv[6],
    )
    import jax

    # Must run before distributed init; env JAX_PLATFORMS is too late here
    # because the axon sitecustomize registers platforms at startup.
    jax.config.update("jax_platforms", "cpu")
    from multibox_tpu.cli.common import setup_jax_cache

    setup_jax_cache()
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nprocs, process_id=pid
    )
    assert jax.process_count() == nprocs

    from multibox_tpu import priors as priors_mod
    from multibox_tpu.config import parse_config_file
    from multibox_tpu.train.loop import train

    cfg = parse_config_file(f"{workdir}/config.yaml")
    priors = priors_mod.load_priors(f"{workdir}/priors.pkl")
    cfg.num_priors = priors.shape[0]

    # shuffle=False: the trajectory-parity check needs every global batch
    # to hold the same record set as the single-process reference run
    # (round-robin record sharding guarantees it only without shuffling).
    train(
        cfg,
        [f"{workdir}/data.tfrecord"],
        priors,
        logdir=f"{workdir}/{logdir_name}",
        max_steps=max_steps,
        shuffle=False,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
