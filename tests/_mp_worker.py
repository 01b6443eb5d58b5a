"""Worker process for tests/test_multiprocess.py — NOT a test module.

Joins a 2-process Gloo-backed JAX runtime (jax.distributed.initialize),
builds the GLOBAL 4-device chain mesh, runs epitpu.dist.sharded_pmmh across
both processes, and saves this process's addressable shards (+ an
is_primary_host-gated report) for the parent test to reassemble and compare
against the single-process run.
"""
import json
import os
import sys


def tiny_sir_data():
    """Deterministic tiny dataset shared by worker and parent test."""
    import numpy as np

    from epitpu.ode import sir_simulate_discrete

    t = np.linspace(0, 6, 60)
    df = sir_simulate_discrete((480.0, 20.0, 0.0), t, 2.0, 1.0)
    latent = df[["susceptible", "infected", "removed"]].to_numpy()
    rng = np.random.default_rng(9)
    return rng.binomial(np.round(latent).astype(int), 0.3).astype("float32")


def run_workload(mesh):
    import jax.numpy as jnp

    from epitpu.dist import sharded_pmmh
    from epitpu.models import sir_model
    from epitpu.observe import get_observation_model

    import jax

    y = jnp.asarray(tiny_sir_data())
    return sharded_pmmh(
        mesh,
        sir_model(),
        get_observation_model("binomial"),
        jax.random.PRNGKey(11),
        y,
        jnp.array([2.0, 1.0]),
        0.05,
        n_chains_total=4,
        n_iters=12,
        obs_param=0.3,
        n_particles=16,
        n_population=500.0,
        mu=20.0,
        steps_per_unit=2,
        n_init_attempts=2,
    )


def run_particle_workload(mesh):
    """Particle-axis sharded filter: the psum-logsumexp weight reduction and
    the all_gather resampling collectives cross the PROCESS boundary over
    Gloo when the mesh spans both workers."""
    import jax
    import jax.numpy as jnp

    from epitpu.dist import sharded_particle_filter
    from epitpu.models import sir_model
    from epitpu.observe import get_observation_model

    y = jnp.asarray(tiny_sir_data())
    return sharded_particle_filter(
        mesh,
        sir_model(),
        get_observation_model("binomial"),
        jax.random.PRNGKey(21),
        y,
        jnp.array([2.0, 1.0]),
        0.3,
        n_particles_total=64,
        n_population=500.0,
        mu=20.0,
        steps_per_unit=2,
    )


def run_pmmh_particle_workload(mesh):
    """PMMH whose FILTER particle axis spans both processes (round-4: the
    particle mesh axis is plumbed into the PMMH step itself): 1 chain, its
    64-particle cloud split 16/shard over 4 devices across 2 processes —
    the psum/all_gather collectives inside the PMMH iteration ride Gloo."""
    import jax
    import jax.numpy as jnp

    from epitpu.dist import sharded_pmmh
    from epitpu.models import sir_model
    from epitpu.observe import get_observation_model

    y = jnp.asarray(tiny_sir_data())
    return sharded_pmmh(
        mesh,
        sir_model(),
        get_observation_model("binomial"),
        jax.random.PRNGKey(31),
        y,
        jnp.array([2.0, 1.0]),
        0.05,
        n_chains_total=1,
        n_iters=8,
        obs_param=0.3,
        n_particles=64,  # global per chain: 16 per shard
        n_population=500.0,
        mu=20.0,
        steps_per_unit=2,
        n_init_attempts=2,
    )


def main():
    port, process_id, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    import jax

    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=process_id,
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import numpy as np

    from epitpu.dist import make_mesh
    from epitpu.dist.multihost import is_primary_host

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()

    mesh = make_mesh(n_chain_shards=4)
    result = run_workload(mesh)

    shards = {}
    for s in result.thetas.addressable_shards:
        start = s.index[0].start or 0
        shards[str(start)] = np.asarray(s.data)

    # particle-axis collectives across the process boundary: every process
    # must agree on the replicated log-likelihood
    mesh_p = make_mesh(n_chain_shards=1, n_particle_shards=4)
    fres = run_particle_workload(mesh_p)
    ll = float(np.asarray(fres.log_likelihood.addressable_shards[0].data))
    assert np.isfinite(ll), ll
    shards["particle_ll"] = np.asarray(ll)

    # particle-axis-sharded PMMH across the process boundary: the chain
    # outputs are replicated along the particle axis, so both processes
    # must hold the identical theta history
    pres = run_pmmh_particle_workload(mesh_p)
    shards["pmmh_p_thetas"] = np.asarray(
        pres.thetas.addressable_shards[0].data
    )

    np.savez(
        os.path.join(out_dir, f"shards_p{process_id}.npz"),
        **shards,
    )
    # artifact writes are primary-host-gated (epitpu.dist.multihost)
    if is_primary_host():
        with open(os.path.join(out_dir, "report.json"), "w") as f:
            json.dump(
                {"process_id": process_id,
                 "process_count": jax.process_count()}, f,
            )
    print(f"[worker {process_id}] OK", flush=True)


if __name__ == "__main__":
    main()
