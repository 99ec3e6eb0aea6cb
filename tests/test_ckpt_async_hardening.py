"""Adversarial tests for the async checkpoint path (train/checkpoints.py):
torn writes under SIGKILL and out-of-order best/last completion.

Contract being defended (the reference's single-file layout,
builder/utils/logger.py:166-177, plus our async extension): at every
instant, each of ``{best,last}_fold{k}_seed{s}.pth`` is either absent or a
fully-loadable checkpoint — a crash can lose the newest save but can never
leave a torn file at the final path (writes go to ``<path>.tmp`` then
``os.replace``), and a 'best' dispatched at epoch N can never land after —
or clobber — a 'last' dispatched at epoch N+1 (AsyncCheckpointer.save_multi
joins the in-flight save before dispatching the next one)."""
import os
import pickle
import signal
import subprocess
import sys
import textwrap
import time

import numpy as np


def _load(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def test_sigkill_mid_pickle_write_leaves_loadable_files(tmp_path):
    """SIGKILL the saver mid-pickle: the final paths must hold either
    nothing or a complete checkpoint — never the partial write.

    The child writes a GOOD 'last'+'best' pair (epoch 1), then starts an
    epoch-2 save whose pickle.dump is patched to write half its payload and
    SIGKILL the process (the deterministic analog of dying mid-async-drain).
    The parent then asserts both files still load and still say epoch 1."""
    script = textwrap.dedent("""
        import os, pickle, signal, sys
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        from medical_tri_modal_pilot_tpu.train import checkpoints as C

        class FakeState:
            params = {"w": jnp.arange(1024.0)}
            batch_stats = {}
            opt_state = {"m": jnp.zeros(1024)}
            step = jnp.asarray(1)

        d = sys.argv[1]
        last = os.path.join(d, "last_fold0_seed412.pth")
        best = os.path.join(d, "best_fold0_seed412.pth")
        ck = C.AsyncCheckpointer()
        ck.save_multi([(last, 0, 1), (best, 1, 1)], FakeState(),
                      score=0.5, epoch=1)
        ck.wait()
        print("epoch1 saved", flush=True)

        real_dump = pickle.dump
        def torn_dump(obj, f, *a, **k):
            f.write(pickle.dumps(obj)[: 100])   # half-written .tmp ...
            f.flush()
            os.fsync(f.fileno())
            os.kill(os.getpid(), signal.SIGKILL)   # ... then die mid-write
        C.pickle.dump = torn_dump
        ck.save_multi([(last, 0, 2), (best, 2, 2)], FakeState(),
                      score=0.9, epoch=2)
        ck.wait()
        print("unreachable", flush=True)
    """)
    r = subprocess.run([sys.executable, "-c", script, str(tmp_path)],
                       capture_output=True, text=True, timeout=300,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert "epoch1 saved" in r.stdout, r.stderr
    assert r.returncode == -signal.SIGKILL, (r.returncode, r.stderr)
    last = tmp_path / "last_fold0_seed412.pth"
    best = tmp_path / "best_fold0_seed412.pth"
    for p in (last, best):
        assert p.exists(), "epoch-1 file vanished under the torn epoch-2 save"
        payload = _load(p)   # raises on a torn file
        assert payload["epoch"] == 1
        np.testing.assert_array_equal(payload["model"]["params"]["w"],
                                      np.arange(1024.0))


def test_sigkill_between_last_and_best_writes(tmp_path):
    """Die after 'last' landed but before 'best' did (save_multi writes the
    jobs sequentially): 'last' must be the complete NEW file and 'best'
    must still be the complete OLD one — mixed generations are fine,
    torn files are not."""
    script = textwrap.dedent("""
        import os, pickle, signal, sys
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        from medical_tri_modal_pilot_tpu.train import checkpoints as C

        class FakeState:
            params = {"w": jnp.arange(8.0)}
            batch_stats = {}
            opt_state = {"m": jnp.zeros(8)}
            step = jnp.asarray(1)

        d = sys.argv[1]
        last = os.path.join(d, "last_fold0_seed412.pth")
        best = os.path.join(d, "best_fold0_seed412.pth")
        ck = C.AsyncCheckpointer()
        ck.save_multi([(last, 0, 1), (best, 1, 1)], FakeState(),
                      score=0.5, epoch=1)
        ck.wait()
        print("epoch1 saved", flush=True)

        real_replace = os.replace
        epoch2 = []
        def replace_then_die(src, dst):
            real_replace(src, dst)
            if dst == last and epoch2:   # job 1 of the epoch-2 save just
                os.kill(os.getpid(), signal.SIGKILL)   # landed; die before
            #                                            job 2 ('best')
        C.os.replace = replace_then_die
        epoch2.append(True)
        ck.save_multi([(last, 0, 2), (best, 2, 2)], FakeState(),
                      score=0.9, epoch=2)
        ck.wait()
        print("unreachable", flush=True)
    """)
    r = subprocess.run([sys.executable, "-c", script, str(tmp_path)],
                       capture_output=True, text=True, timeout=300,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert "epoch1 saved" in r.stdout, r.stderr
    assert r.returncode == -signal.SIGKILL, (r.returncode, r.stderr)
    last = _load(tmp_path / "last_fold0_seed412.pth")
    best = _load(tmp_path / "best_fold0_seed412.pth")
    assert last["epoch"] == 2, "job 1 ('last') completed before the kill"
    assert best["epoch"] == 1, "job 2 ('best') never started"
    # the resume contract tolerates best older than last (resume reads
    # 'last'; the next improvement rewrites 'best')


def test_out_of_order_dispatch_is_serialized(tmp_path, monkeypatch):
    """A slow best@N save dispatched before last@N+1 must not complete
    after it: save_multi joins the in-flight thread before dispatching, so
    the files always land in dispatch order (no newer 'last' ever gets
    clobbered by an older in-flight write)."""
    import jax.numpy as jnp
    from medical_tri_modal_pilot_tpu.train import checkpoints as C

    class FakeState:
        params = {"w": jnp.arange(4.0)}
        batch_stats = {}
        opt_state = {"m": jnp.zeros(4)}
        step = jnp.asarray(1)

    done = []
    real_fetch = C._pack_fetch_start

    def slow_first_fetch(tree):
        finish = real_fetch(tree)
        slow = len(done) == 0
        done.append(True)

        def wrapped():
            if slow:
                time.sleep(0.8)   # epoch-N drain still running when the
            return finish()       # epoch-N+1 save is dispatched

        return wrapped

    monkeypatch.setattr(C, "_pack_fetch_start", slow_first_fetch)
    last = str(tmp_path / "last_fold0_seed412.pth")
    best = str(tmp_path / "best_fold0_seed412.pth")
    ck = C.AsyncCheckpointer()
    t0 = time.perf_counter()
    ck.save_multi([(last, 0, 10), (best, 10, 10)], FakeState(),
                  score=0.5, epoch=10)            # slow drain (0.8 s)
    ck.save_multi([(last, 10, 20)], FakeState(),  # dispatched "later"
                  score=0.4, epoch=11)
    dispatch_wall = time.perf_counter() - t0
    ck.wait()
    # the second dispatch must have joined the slow first save ...
    assert dispatch_wall >= 0.8, (
        f"epoch-11 save dispatched {dispatch_wall:.2f}s in — it raced the "
        f"in-flight epoch-10 drain")
    # ... so the files reflect dispatch order: last is 11, best stayed 10
    assert _load(last)["epoch"] == 11
    assert _load(best)["epoch"] == 10
    assert not os.path.exists(last + ".tmp")
