"""Multi-host eval gathering: 2 real CPU processes via jax.distributed.

The collect_results_cpu contract (apis/test.py:136-176): after each host
evaluates its dataset shard, gathering must reconstruct the full, identical
result set on every host.
"""
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

REPO = os.path.join(os.path.dirname(__file__), "..")

CHILD = textwrap.dedent("""
    import os, sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    from dskd_tpu.parallel.collect import collect_image_results

    # host 0 evaluates images [1, 3, 5]; host 1 evaluates [2, 4] (uneven)
    my_ids = [1, 3, 5] if pid == 0 else [2, 4]
    rng = np.random.RandomState(7)   # same stream on both: regenerate all
    all_results = {}
    for img_id in [1, 2, 3, 4, 5]:
        k = rng.randint(1, 4)
        all_results[img_id] = (
            rng.rand(k, 4).astype(np.float32) * 50,
            rng.rand(k).astype(np.float32),
            rng.randint(1, 10, k).tolist(),
            rng.randint(0, 256, (k, 7, 7)).astype(np.uint8))
    local = [(i,) + all_results[i] for i in my_ids]

    gathered = collect_image_results(local, max_dets=4)
    got = {g[0]: g[1:] for g in gathered}
    assert set(got) == {1, 2, 3, 4, 5}, set(got)
    for img_id, (b, s, c, m) in all_results.items():
        gb, gs, gc, gm = got[img_id]
        np.testing.assert_allclose(gb, b, rtol=1e-6)
        np.testing.assert_allclose(gs, s, rtol=1e-6)
        assert list(gc) == list(c)
        np.testing.assert_array_equal(gm, m)   # uint8 mask grids ride along
    print(f"host {pid} OK")
""")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_host_collect_reconstructs_full_set(tmp_path):
    port = _free_port()
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    env.pop("XLA_FLAGS", None)   # children are single-device processes
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    outs = [p.communicate(timeout=180)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {i} failed:\n{out}"
        assert f"host {i} OK" in out
