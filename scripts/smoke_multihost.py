"""Two-process jax.distributed smoke: coordinator rendezvous + cross-process
collective + pickled-object allgather (the multi-host story of
parallel/distributed.py, replacing the reference's file:// NCCL rendezvous).

Usage: python scripts/smoke_multihost.py            # forks both processes
       python scripts/smoke_multihost.py <rank>     # single worker
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COORD = "localhost:12355"


def worker(rank: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=COORD, num_processes=2,
                               process_id=rank)
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vln_goat_tpu.parallel.distributed import all_gather_objects

    assert jax.process_count() == 2
    devs = jax.devices()
    assert len(devs) == 2, devs
    mesh = Mesh(devs, ("dp",))

    # cross-process psum via a sharded sum
    local = jnp.asarray([float(rank + 1)])
    glob = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")), local, (2,))
    total = jax.jit(lambda x: jnp.sum(x),
                    out_shardings=NamedSharding(mesh, P()))(glob)
    assert float(total) == 3.0, float(total)

    objs = all_gather_objects({"rank": rank, "msg": f"hello-{rank}"})
    assert len(objs) == 2 and objs[0]["rank"] == 0 and objs[1]["rank"] == 1
    if rank == 0:
        print("MULTIHOST_OK", objs, flush=True)


def main():
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
        return
    procs = [subprocess.Popen([sys.executable, __file__, str(r)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for r in range(2)]
    ok = True
    for r, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        text = out.decode()
        if p.returncode != 0:
            ok = False
            print(f"rank {r} FAILED:\n{text[-2000:]}")
        elif "MULTIHOST_OK" in text:
            print(f"rank {r}: MULTIHOST_OK")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
