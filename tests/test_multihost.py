"""Execute the multi-host (DCN) seam instead of asserting it.

Every other multi-device artifact in the repo is single-process (8 virtual
devices in one process).  This spawns TWO OS processes x 4 CPU devices with
a loopback ``jax.distributed`` coordinator and drives a sharded train step
plus metric reduction through the real seam functions
(``maybe_init_distributed``, ``shard_batch``'s
``make_array_from_process_local_data`` branch, ``local_batch_slice``) —
SURVEY.md §5.8; the reference's analogue is mmdetection's NCCL DDP
bring-up, which it also never runs single-host.
"""

import os.path as osp
import socket
import subprocess
import sys

_HERE = osp.dirname(osp.abspath(__file__))


def _free_port():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def test_two_process_seam():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, osp.join(_HERE, 'multihost_worker.py'),
             str(i), '2', str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {i} failed:\n{out}'
        assert f'MULTIHOST_OK process={i}' in out, out
    # both processes reduced to the identical full-batch loss
    losses = {out.split('loss=')[1].strip() for out in outs}
    assert len(losses) == 1, losses
