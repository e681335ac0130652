"""Two-party streaming reconciliation pipeline.

Reference capability: the EC daemon ``ecd2`` (SURVEY.md §3 #10, §4.3-4.4) —
the processblock manager that groups sifted epochs into blocks, drives each
through QBER-estimation → reconciliation → verification → privacy
amplification, exchanges EC packets with the peer, and keeps the leakage
ledger.

TPU-first redesign (SURVEY.md §2 "what to preserve"): instead of a select()
loop over one block at a time, the scheduler works in **windows** — a window
is a fixed batch of B key blocks processed as one device program (DP over the
lane axis).  The per-window protocol needs exactly TWO round trips
(QBER handshake + syndrome/ack), versus Cascade's dozens per block:

    Alice                                   Bob
    ─────                                   ───
    QberDisclose(test bits)  ──────────►    estimate QBER, pick rate
                             ◄──────────    RateSelect(qber, rate)
    frame blocks, syndromes  ──────────►    decode batch, verify hashes
                             ◄──────────    VerifyAck(ok mask)
    PA on ok blocks                         PA on ok blocks
    (identical final keys — all PA inputs derive from the shared session seed)

Round-2 redesign for end-to-end device throughput: ALL per-window compute —
framing scatter, syndrome encode, LLR assembly, decode, verification hashes,
error counts, privacy amplification — runs in three fused jitted programs
per ladder rung (qtpu.window_programs), compiled once per rung with static
shapes.  Fine rate adaptation is a mask over a static-size payload vector
(extra-shortened positions carry shared-PRNG fill; the final-key length
subtracts them), so per-window shortening never recompiles.  Payloads stay
device-resident between decode and PA.  Alice may pipeline several windows
(``max_inflight_windows``) so host framing of window w+1 overlaps the
device's decode of window w.

Rate-step application (the round-1 verification finding): framing OWNS the
puncture/shorten mechanics — payload bits only ever enter payload columns,
punctured columns get Alice-private randomness (LLR 0 at Bob), shortened
columns get shared-PRNG bits (LLR ±BIG at Bob) — so the leakage ledger is
correct by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qtpu import pa as pa_mod
from qtpu import prng
from qtpu.accounting import Ledger
from qtpu.ldpc.codes import QCCode, RateLadder, RateStep, make_rate_ladder
from qtpu.link import LoopbackLink
from qtpu.messages import (Abort, Message, MsgType, QberDisclose, RateSelect,
                           RetryDisclose, Syndromes, VerifyAck)
from qtpu.window_programs import WindowPrograms, make_window_programs

__all__ = ["PipelineConfig", "AliceSession", "BobSession", "run_loopback",
           "production_config"]


def production_config(**overrides) -> "PipelineConfig":
    """The tuned production configuration (lowest measured leakage):
    n=65536 blocks on the 10-rung native3 ladder (DE-designed punctured
    protographs, qtpu.ldpc.designed; fine-calibrated at 0.05% resolution —
    the rate-0.742 rung decodes at 3.38% QBER), 16-block windows (1 Mbit of
    payload per decode step), adaptive QBER disclosure (8k max / 512 floor).
    Override any field via kwargs; family="native2", n=16384 reproduces the
    round-1 production setup."""
    base = dict(n=65536, family="native3", blocks_per_window=16,
                qber_test_bits=8192, qber_segment_bits=32768)
    base.update(overrides)
    return PipelineConfig(**base)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Protocol configuration — must be identical on both sides (the
    reference's compile-time defaultdefinitions.h role)."""

    n: int = 4096
    dv: int = 3
    dc: int = 6
    code_seed: int = 0x51C0DE
    family: str = "mixed"   # mother-code family per rung (see make_rate_ladder)
    # Must match the calibrated ladder (DEFAULT_CALIBRATION keys assume the
    # make_rate_ladder default target rates).
    target_rates: tuple = (0.5, 0.6, 0.7, 0.8, 0.875)
    blocks_per_window: int = 16
    qber_test_bits: int = 2048       # disclosed per window (max, see floor)
    # Adaptive disclosure: once the post-decode prior is warm, Bob requests
    # only enough fresh test bits to keep the UCB inflation under budget,
    # never fewer than this floor (drift detection).  Set equal to
    # qber_test_bits to disable adaptivity.
    qber_test_floor: int = 512
    qber_segment_bits: int = 8192    # test bits sampled from this much stream
    max_iters: int = 60
    alg: str = "layered"   # row-layered min-sum: best thresholds + speed
    verify_hash_bits: int = 64
    security_margin_bits: int = 64
    # Blind-reconciliation retry: blocks that fail verification get
    # retry_fraction of their payload disclosed (protocol-PRNG positions) and
    # are re-decoded with those bits pinned, up to max_retries times, before
    # being discarded.
    max_retries: int = 1
    retry_fraction: float = 0.125
    efficiency: float = 1.4          # rate-selection efficiency factor f
                                     # (finite-length regular codes + min-sum)
    # Fine rate adaptation: per-window extra shortening interpolates the
    # effective rate between ladder rungs (needs the measured
    # ceiling-vs-shortening curves; silently coarse-selects without them).
    fine_rate_adaptation: bool = True
    short_granularity: int = 32      # extra-short bits round up to this
    # Post-decode QBER tracking: every verified block reveals its exact
    # error count to Bob for free (corrected vs received payload); a
    # decaying prior from these tightens the next window's estimate and its
    # confidence bound, cutting both test-bit disclosure needs and the
    # shortening safety margin.  halflife is in windows; 0 disables.
    qber_prior_halflife: float = 4.0
    qber_prior_max_n: int = 65536    # cap on the prior's effective sample size
    # Streaming overlap (PP): Alice starts up to this many windows before the
    # previous ones complete, so host framing + link I/O of window w+1 hide
    # under the device's decode of window w.
    max_inflight_windows: int = 2
    # Privacy amplification mode: "per_block" hashes each block separately
    # (batched FFT, the throughput path); "stream" accumulates the verified
    # payload stream and hashes it with ONE Toeplitz seed spanning block and
    # window boundaries every pa_stream_windows windows (overlap-save scan on
    # one device, psum-combined shards on a mesh — BASELINE.json:5).
    pa_mode: str = "per_block"
    pa_stream_windows: int = 4


@dataclasses.dataclass
class WindowMetrics:
    """Per-window observability record (SURVEY.md §6.5 — the judge's
    metrics: sifted bits, QBER, rate, iteration stats, FER, leakage,
    final bits)."""

    window_id: int
    qber_est: float
    rate_index: int
    rate_eff: float
    blocks: int
    blocks_ok: int
    iters_mean: float
    iters_max: int
    payload_bits: int
    leaked_syndrome: int
    leaked_qber: int
    leaked_hash: int
    final_bits: int
    blocks_retried: int = 0
    extra_short_bits: int = 0   # fine rate adaptation, per block

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


class _Party:
    """Shared machinery: code, ladder, per-rate device programs, framing."""

    def __init__(self, config: PipelineConfig, session_seed: int):
        self.config = config
        self.ladder: RateLadder = make_rate_ladder(
            config.n, config.dv, config.target_rates, seed=config.code_seed,
            alg=config.alg, family=config.family)
        self.session = prng.root_key(session_seed)
        self.ledger = Ledger()
        self.buffer = np.zeros(0, np.uint8)   # sifted-bit stream buffer
        self.window_id = 0
        self.final_key_words: list[np.ndarray] = []
        # (window_id, block_index) provenance per final-key segment: lets the
        # application detect/align desyncs after asymmetric aborts.
        self.final_key_index: list[tuple[int, int]] = []
        self.metrics: list[WindowMetrics] = []
        # Per-rate-step fused device programs, compiled lazily on first use.
        self._programs: dict[int, WindowPrograms] = {}
        # Streaming-PA accumulator (pa_mode="stream").
        self._stream_buf: list[np.ndarray] = []
        self._stream_net = 0
        self._stream_pending = 0
        self._stream_flushes = 0
        # Static per-step position arrays (variable index space).
        self._step_positions: dict[int, dict] = {
            idx: self._positions_for(step)
            for idx, step in enumerate(self.ladder.steps)
        }

    def programs(self, rate_index: int) -> WindowPrograms:
        if rate_index not in self._programs:
            step = self.ladder.steps[rate_index]
            pos = self._step_positions[rate_index]
            P = int(pos["payload"].size)
            l_max = max(0, P - step.leaked_bits()
                        - self.config.verify_hash_bits
                        - self.config.security_margin_bits)
            self._programs[rate_index] = make_window_programs(
                step.code, pos["payload"], pos["punct"], pos["short"],
                self.config.max_iters, self.config.alg,
                self.config.verify_hash_bits, l_max,
                batch=self.config.blocks_per_window,
                mesh=getattr(self, "_mesh", None))
        return self._programs[rate_index]

    # -- framing ---------------------------------------------------------

    def _positions_for(self, step: RateStep) -> dict:
        z, nb = step.code.z, step.code.nb
        cols = np.arange(nb)
        special = set(step.punct_cols) | set(step.short_cols)
        payload_cols = np.array([c for c in cols if c not in special], np.int32)
        def expand(cs):
            cs = np.asarray(sorted(cs), np.int32)
            if cs.size == 0:
                return np.zeros(0, np.int64)
            return (cs[:, None] * z + np.arange(z)[None, :]).reshape(-1)
        return {
            "payload": expand(payload_cols),
            "punct": expand(step.punct_cols),
            "short": expand(step.short_cols),
        }

    def payload_per_block(self, rate_index: int) -> int:
        """Static payload-vector size P of the rung (incl. extra-shortened
        positions — those carry PRNG fill, not stream bits)."""
        return int(self._step_positions[rate_index]["payload"].size)

    def window_payload_bits(self, rate_index: int, short_bits: int = 0) -> int:
        """STREAM bits consumed per window at this rung + fine shortening."""
        return ((self.payload_per_block(rate_index) - short_bits)
                * self.config.blocks_per_window)

    def _xshort_mask(self, rate_index: int, window_id: int,
                     short_bits: int) -> np.ndarray:
        """(P,) bool — per-window extra-shortened payload positions
        (protocol-PRNG-chosen; both parties derive the identical mask)."""
        P = self.payload_per_block(rate_index)
        mask = np.zeros(P, bool)
        if short_bits:
            key = prng.derive(self.session, "xshort", window_id, rate_index)
            sel = np.asarray(prng.subset_indices(key, P, short_bits))
            mask[sel] = True
        return mask

    def _assemble_payload(self, stream: np.ndarray, xmask: np.ndarray,
                          window_id: int) -> np.ndarray:
        """(B, P) payload vector: stream bits at unmasked positions,
        shared-PRNG fill at extra-shortened ones."""
        B = self.config.blocks_per_window
        s = int(xmask.sum())
        payload = np.empty((B, xmask.size), np.uint8)
        payload[:, ~xmask] = stream
        if s:
            key = prng.derive(self.session, "xshort-fill", window_id)
            payload[:, xmask] = np.asarray(prng.random_bits(key, (B, s)))
        return payload

    def _shared_short_bits(self, window_id: int, count: int) -> np.ndarray:
        """Whole-column shortening fill known to both parties."""
        if count == 0:
            return np.zeros((self.config.blocks_per_window, 0), np.uint8)
        key = prng.derive(self.session, "short", window_id)
        return np.asarray(prng.random_bits(
            key, (self.config.blocks_per_window, count)))

    def _verify_key(self, window_id: int) -> np.ndarray:
        return prng.key_data(prng.derive(self.session, "verify", window_id))

    # -- verification / PA ----------------------------------------------

    def _final_base_length(self, rate_index: int, qber_bits: int,
                           short_bits: int) -> int:
        """Final length of a block with no retry leakage: the rung's static
        maximum minus the window's amortized QBER disclosure and the
        publicly-derivable extra-shortened positions."""
        l_max = self.programs(rate_index).l_max
        qber_amort = -(-qber_bits // self.config.blocks_per_window)
        return max(0, l_max - qber_amort - short_bits)

    def _privacy_amplify(self, payload_dev, ok_mask: np.ndarray,
                         rate_index: int, window_id: int, qber_bits: int,
                         short_bits: int,
                         extra_leak: Optional[np.ndarray] = None) -> int:
        """Hash ok blocks to final keys; returns total final bits.

        payload_dev: (B, P) device array (stays resident from the decode).
        extra_leak: (B,) per-block additional disclosed bits (retry rounds);
        blocks compress to l_base - extra_leak[b].  Blocks sharing a leak
        value hash as one batched device call; the rung-static (B, l_max)
        output is sliced to the dynamic length on host (prefix of a Toeplitz
        hash = Toeplitz hash of the seed prefix — protocol-exact).
        """
        B = self.config.blocks_per_window
        prog = self.programs(rate_index)
        l_base = self._final_base_length(rate_index, qber_bits, short_bits)
        if l_base == 0 or prog.l_max == 0:
            return 0
        if extra_leak is None:
            extra_leak = np.zeros(B, np.int64)
        fk_by_block: dict[int, np.ndarray] = {}
        l_by_block: dict[int, int] = {}
        for extra in sorted(set(int(e) for b, e in enumerate(extra_leak)
                                if ok_mask[b])):
            l = max(0, min(l_base - extra, prog.l_max))
            if l == 0:
                continue
            key = prng.key_data(prng.derive(self.session, "pa", window_id,
                                            extra))
            fk = np.asarray(prog.pa(payload_dev, key))[:, :l]
            for b in range(B):
                if ok_mask[b] and int(extra_leak[b]) == extra:
                    fk_by_block[b] = fk[b]
                    l_by_block[b] = l
        total = 0
        for b in range(B):
            if b in fk_by_block:
                self.final_key_words.append(fk_by_block[b])
                self.final_key_index.append((window_id, b))
                total += l_by_block[b]
        return total

    # -- streaming PA (pa_mode="stream") ---------------------------------

    def _stream_accumulate(self, payload_dev, ok: np.ndarray, rate_index: int,
                           window_id: int, qber_bits: int, short_bits: int,
                           extra_leak: np.ndarray) -> int:
        """Accumulate this window's verified payload into the continuous key
        stream with net-length bookkeeping; flush every pa_stream_windows
        windows.  Returns final bits emitted (0 between flushes)."""
        step = self.ladder.steps[rate_index]
        B = self.config.blocks_per_window
        pay = np.asarray(payload_dev)[ok]
        okc = int(ok.sum())
        P = self.payload_per_block(rate_index)
        if okc:
            self._stream_buf.append(pay.reshape(-1))
        # Conservative leakage: every disclosed bit of the window counts,
        # including failed blocks' syndromes/retries; extra-shortened
        # positions of surviving blocks are publicly derivable fill.
        leak = (step.leaked_bits() * B + qber_bits
                + self.config.verify_hash_bits * B
                + int(extra_leak.sum()) + short_bits * okc)
        self._stream_net += okc * P - leak
        self._stream_pending += 1
        if self._stream_pending >= self.config.pa_stream_windows:
            return self._flush_stream(window_id)
        return 0

    def _flush_stream(self, window_id: int) -> int:
        """Hash the accumulated stream with one Toeplitz seed (overlap-save
        on one device; sharded + psum on a mesh)."""
        stream = (np.concatenate(self._stream_buf) if self._stream_buf
                  else np.zeros(0, np.uint8))
        net = self._stream_net
        flush_idx = self._stream_flushes
        self._stream_buf = []
        self._stream_net = 0
        self._stream_pending = 0
        self._stream_flushes += 1
        m = max(0, net - self.config.security_margin_bits)
        if m == 0 or stream.size == 0:
            return 0
        mesh = getattr(self, "_mesh", None)
        # Pad length is PROTOCOL configuration (both parties must hash the
        # identical padded stream regardless of their local mesh topology);
        # any power-of-two mesh up to the segment size divides it evenly.
        segment = 1 << 16
        n_pad = -(-stream.size // segment) * segment
        padded = np.zeros(n_pad, np.uint8)
        padded[: stream.size] = stream
        key = prng.derive(self.session, "pa-stream", flush_idx)
        t = prng.random_bits(key, (m + n_pad - 1,))
        if mesh is not None:
            from qtpu.parallel import make_stream_pa
            fk = make_stream_pa(mesh, n_pad, m)(jnp.asarray(t),
                                                jnp.asarray(padded))
        else:
            fk = pa_mod.stream_toeplitz(jnp.asarray(t), jnp.asarray(padded),
                                        m, segment=segment)
        self.final_key_words.append(np.asarray(fk))
        self.final_key_index.append((window_id, -1 - flush_idx))
        return m

    def _retry_bits_per_block(self, p_bits: int) -> int:
        return max(1, int(self.config.retry_fraction * p_bits))

    def _retry_positions(self, window_id: int, round_: int,
                         p_bits: int) -> np.ndarray:
        """Payload-position indices disclosed in this retry round (both
        parties derive the identical set; p_bits is the rung's static
        payload-vector size P)."""
        key = prng.derive(self.session, "retry", window_id, round_)
        return np.asarray(prng.subset_indices(
            key, p_bits, self._retry_bits_per_block(p_bits)))

    # -- stream management ----------------------------------------------

    def push_sifted(self, bits: np.ndarray) -> None:
        self.ledger.add(sifted_bits=len(bits))
        self.buffer = np.concatenate([self.buffer, np.asarray(bits, np.uint8)])

    def _take(self, count: int) -> np.ndarray:
        assert len(self.buffer) >= count
        out, self.buffer = self.buffer[:count], self.buffer[count:]
        return out

    def _qber_positions(self, window_id: int, count: int) -> np.ndarray:
        from qtpu.qber import test_positions
        return test_positions(self.session, window_id,
                              self.config.qber_segment_bits, count)

    def final_key_bits(self) -> np.ndarray:
        if not self.final_key_words:
            return np.zeros(0, np.uint8)
        return np.concatenate(self.final_key_words)

    def _sync_auth_bits(self) -> None:
        """Charge channel-authentication key consumption (AuthedLink) to the
        ledger — absolute, the link owns the counter."""
        consumed = getattr(self.link, "consumed_bits", None)
        if consumed is not None:
            self.ledger.auth_bits = int(consumed)

    # -- checkpoint / resume (SURVEY.md §6.4) ----------------------------
    # The durable unit is the stream cursor: window counter, leakage ledger,
    # and the unconsumed sifted-bit buffer.  In-flight windows are NOT
    # checkpointed — like the reference's crashed processblocks they are
    # simply lost and the stream resumes at the cursor (at-least-once
    # semantics, §6.3).

    def checkpoint_state(self) -> dict:
        from qtpu.framing import pack_bits
        return {
            "window_id": self.window_id,
            "ledger": self.ledger.as_dict(),
            "buffer_bits": int(len(self.buffer)),
            "buffer_words": [int(w) for w in pack_bits(self.buffer)] if len(self.buffer) else [],
            "final_bits": int(sum(len(w) for w in self.final_key_words)),
        }

    def restore_state(self, state: dict) -> None:
        from qtpu.framing import unpack_bits
        self.window_id = int(state["window_id"])
        self.ledger = Ledger(**state["ledger"])
        n = int(state["buffer_bits"])
        if n:
            words = np.asarray(state["buffer_words"], np.uint32)
            self.buffer = unpack_bits(words, n).astype(np.uint8)
        else:
            self.buffer = np.zeros(0, np.uint8)


class AliceSession(_Party):
    """Source-side (encoder) session: discloses QBER bits, sends syndromes."""

    def __init__(self, config: PipelineConfig, session_seed: int,
                 link, private_seed: int = 0xA11CE):
        super().__init__(config, session_seed)
        self.link = link
        self._private = np.random.default_rng(private_seed)  # punctured-bit fill
        self._inflight: dict[int, dict] = {}
        # Adaptive QBER disclosure: Bob's VerifyAck carries the size he wants
        # for the next window; cold sessions use the configured maximum.
        self._next_test_bits = config.qber_test_bits
        # Monotone window-id dispenser: ids are handed out exactly once.
        # (Deriving the next id from the in-flight set reuses an id when
        # windows complete out of order — a retried window outliving its
        # successor — which desyncs the parties' stream cursors.)
        self._next_start = 0

    def can_start_window(self) -> bool:
        # Worst case payload need: the highest-rate step (most puncturing) has
        # the smallest payload; reserve for the largest (= mother code).
        #
        # Pipelining constraint: window w+1 may only start once every earlier
        # in-flight window has consumed its stream bits (stage past
        # "qber_sent").  Both parties take bits from the buffer in their
        # local event order, and the link is FIFO — starting w+1 before
        # framing w would interleave Alice's takes (seg w, seg w+1, stream w)
        # against Bob's FIFO order (seg w, stream w, seg w+1) and desync the
        # key streams.
        max_need = self.config.qber_segment_bits + self.window_payload_bits(0)
        return (len(self.buffer) >= max_need
                and len(self._inflight) < self.config.max_inflight_windows
                and all(st["stage"] != "qber_sent"
                        for st in self._inflight.values()))

    def _next_window(self) -> int:
        return max(self._next_start, self.window_id)

    def start_window(self) -> None:
        """Step 1: disclose QBER test bits for this window."""
        w = self._next_window()
        self._next_start = w + 1
        k = self._next_test_bits
        seg = self._take(self.config.qber_segment_bits)
        pos = self._qber_positions(w, k)
        test = seg[pos]
        keep = np.delete(seg, pos)  # both parties delete the same positions
        self.buffer = np.concatenate([keep, self.buffer])
        self.ledger.add(qber_test_bits=len(test))
        self._inflight[w] = {"stage": "qber_sent", "qber_bits": k}
        self.link.send(QberDisclose(window_id=w, num_bits=len(test), bits=test))

    def on_message(self, msg: Message) -> None:
        if isinstance(msg, RateSelect):
            self._on_rate_select(msg)
        elif isinstance(msg, VerifyAck):
            self._on_verify_ack(msg)
        elif isinstance(msg, Abort):
            self._on_abort(msg)
        else:
            raise ValueError(f"Alice got unexpected {type(msg).__name__}")

    def abort_window(self, window_id: int, reason: str = "timeout") -> None:
        """Abandon an in-flight window (lost message / timeout — SURVEY.md
        §6.3 at-least-once semantics): consumed payload bits are charged as
        discarded, the peer is told to mirror the abort, and the stream
        resumes at the next window."""
        st = self._inflight.pop(window_id, None)
        if st is None:
            return
        if "stream_bits" in st:
            self.ledger.add(discarded_bits=st["stream_bits"])
        self.window_id = max(self.window_id, window_id + 1)
        self.link.send(Abort(window_id=window_id, reason=reason))

    def _on_abort(self, msg: Abort) -> None:
        st = self._inflight.pop(msg.window_id, None)
        if st is not None and "stream_bits" in st:
            self.ledger.add(discarded_bits=st["stream_bits"])
        self.window_id = max(self.window_id, msg.window_id + 1)

    def _on_rate_select(self, msg: RateSelect) -> None:
        w = msg.window_id
        st = self._inflight.get(w)
        if st is None or st["stage"] != "qber_sent":
            return  # duplicate or stale — at-least-once tolerance
        r = msg.rate_index
        s = msg.short_bits
        step = self.ladder.steps[r]
        pos = self._step_positions[r]
        prog = self.programs(r)
        B = self.config.blocks_per_window
        xmask = self._xshort_mask(r, w, s)
        stream = self._take(self.window_payload_bits(r, s)).reshape(B, -1)
        payload = self._assemble_payload(stream, xmask, w)
        shortfill = self._shared_short_bits(w, pos["short"].size)
        punct = (self._private.integers(0, 2, (B, pos["punct"].size))
                 .astype(np.uint8))
        payload_dev = jnp.asarray(payload)
        syn, hashes = prog.alice(payload_dev, jnp.asarray(shortfill),
                                 jnp.asarray(punct), self._verify_key(w))
        # syn/hashes stay device handles: a serializing link (TCP wire)
        # fetches them in pack_bits; the in-process DirectLoopbackLink
        # passes them straight to Bob's decode program (zero D2H — the
        # classical channel of a deployment is a NIC, not the PCIe bus).
        self.ledger.add(syndrome_bits=step.leaked_bits() * B,
                        verify_hash_bits=self.config.verify_hash_bits * B)
        st.update(stage="syndromes_sent", rate_index=r, short_bits=s,
                  payload=payload, payload_dev=payload_dev,
                  stream_bits=stream.size)
        self.link.send(Syndromes(
            window_id=w, rate_index=r, num_blocks=B,
            syndrome_bits=step.code.m, syndromes=syn, verify_hashes=hashes,
            short_bits=s))

    def _on_verify_ack(self, msg: VerifyAck) -> None:
        w = msg.window_id
        st = self._inflight.pop(w, None)
        if st is None or st["stage"] != "syndromes_sent":
            return  # duplicate or stale ack
        rounds = st.setdefault("retries", 0)
        if msg.round != rounds:
            self._inflight[w] = st  # replayed ack from an earlier round
            return
        if msg.next_test_bits > 0:
            self._next_test_bits = int(np.clip(
                msg.next_test_bits, self.config.qber_test_floor,
                self.config.qber_test_bits))
        ok = msg.ok_mask.astype(bool)
        payload = st["payload"]
        r = st["rate_index"]
        s = st["short_bits"]
        P = payload.shape[1]
        extra = st.setdefault("extra_leak",
                              np.zeros(self.config.blocks_per_window, np.int64))

        failed = ~ok
        if failed.any() and rounds < self.config.max_retries:
            # Blind-reconciliation retry: disclose retry_fraction of the
            # payload (protocol-PRNG positions) for every failed block so Bob
            # can pin those bits and re-decode.  The window stays in flight.
            k = self._retry_bits_per_block(P)
            positions = self._retry_positions(w, rounds, P)
            bits = payload[failed][:, positions]
            extra[failed] += k
            self.ledger.add(syndrome_bits=k * int(failed.sum()))
            st["retries"] = rounds + 1
            self._inflight[w] = st  # re-insert (popped above)
            self.link.send(RetryDisclose(
                window_id=w, round=rounds, num_bits=k,
                failed_mask=failed.astype(np.uint8), bits=bits))
            return

        per_block_stream = P - s
        if self.config.pa_mode == "stream":
            final = self._stream_accumulate(st["payload_dev"], ok, r, w,
                                            st["qber_bits"], s, extra)
        else:
            final = self._privacy_amplify(st["payload_dev"], ok, r, w,
                                          st["qber_bits"], s, extra_leak=extra)
        self.ledger.add(reconciled_bits=int(ok.sum()) * per_block_stream,
                        discarded_bits=int((~ok).sum()) * per_block_stream,
                        final_bits=final, blocks_ok=int(ok.sum()),
                        blocks_failed=int((~ok).sum()))
        self._sync_auth_bits()
        self.window_id = max(self.window_id, w + 1)


class BobSession(_Party):
    """Receiver-side (decoder) session: estimates QBER, decodes, acks."""

    def __init__(self, config: PipelineConfig, session_seed: int, link,
                 mesh=None):
        super().__init__(config, session_seed)
        self.link = link
        self._inflight: dict[int, dict] = {}
        # Optional DP mesh: shards the decode program's block batch over the
        # mesh's first axis with a psum'd per-window ledger (BASELINE
        # config 5).  blocks_per_window must divide by the mesh size.
        self._mesh = mesh
        # Per-window global (psum) device ledgers — window-level
        # introspection for the multi-chip dryrun's parity assertions.
        self.last_gled = None
        self.gled_by_window: dict[int, np.ndarray] = {}
        # Post-decode QBER estimator (Bob-internal prior; the only wire
        # impact is the adaptive next_test_bits request on VerifyAck).
        from qtpu.qber import QberEstimator
        self.qest = QberEstimator(halflife=config.qber_prior_halflife,
                                  max_n=float(config.qber_prior_max_n))
        # Windows whose decode is dispatched but not yet resolved (device
        # futures) — resolved in arrival order by flush().  Deferral lets
        # consecutive windows' decodes queue back-to-back on the device while
        # the host frames the next window (the PP stage-overlap of SURVEY §3).
        self._pending: list[int] = []

    def flush(self) -> bool:
        """Resolve all dispatched decodes (ack windows in order); returns
        True if anything was resolved."""
        did = False
        while self._pending:
            w = self._pending.pop(0)
            st = self._inflight.get(w)
            if st is None or st["stage"] != "decoding":
                continue
            self._resolve_decode(w, st)
            did = True
        return did

    def _next_test_request(self) -> int:
        return self.qest.request_bits(self.config.qber_test_floor,
                                      self.config.qber_test_bits)

    def checkpoint_state(self) -> dict:
        self.flush()
        state = super().checkpoint_state()
        state["qber_prior"] = self.qest.state()
        return state

    def restore_state(self, state: dict) -> None:
        super().restore_state(state)
        # Missing on old checkpoints / Alice-side states: cold prior re-warms.
        self.qest.restore(state.get("qber_prior", [0.0, 0.0]))

    def on_message(self, msg: Message) -> None:
        from qtpu.messages import RetryDisclose
        if isinstance(msg, QberDisclose):
            self._on_qber(msg)
        elif isinstance(msg, Syndromes):
            self._on_syndromes(msg)
        elif isinstance(msg, RetryDisclose):
            self.flush()   # retries reference resolved decode state
            self._on_retry(msg)
        elif isinstance(msg, Abort):
            self.flush()
            self._on_abort(msg)
        else:
            raise ValueError(f"Bob got unexpected {type(msg).__name__}")

    def _on_abort(self, msg: Abort) -> None:
        # Mirror the peer's abort so both ledgers and stream cursors agree
        # (the qber segment was consumed symmetrically; payload only ever
        # leaves the buffer at the syndrome stage, which cannot have happened
        # if the window is being aborted).
        self._inflight.pop(msg.window_id, None)
        self.window_id = max(self.window_id, msg.window_id + 1)

    def _on_qber(self, msg: QberDisclose) -> None:
        w = msg.window_id
        if w in self._inflight or w < self.window_id:
            return  # duplicate disclose (in-flight or already completed)
        k = msg.num_bits   # adaptive: Alice's disclosure sets the size
        seg = self._take(self.config.qber_segment_bits)
        pos = self._qber_positions(w, k)
        mine = seg[pos]
        keep = np.delete(seg, pos)
        self.buffer = np.concatenate([keep, self.buffer])
        self.ledger.add(qber_test_bits=len(mine))
        mism = int((mine ^ msg.bits).sum())
        # Combine the disclosed test bits with the post-decode prior; select
        # against the upper confidence bound so an underestimated QBER can't
        # cross a rung's measured ceiling.
        q, q_ucb = self.qest.estimate(mism, len(mine))
        if self.config.fine_rate_adaptation:
            overhead = (self.config.verify_hash_bits
                        + self.config.security_margin_bits
                        + -(-k // self.config.blocks_per_window))
            r, s = self.ladder.select_fine(
                q_ucb, granularity=self.config.short_granularity,
                efficiency=self.config.efficiency, overhead_bits=overhead)
        else:
            r, s = self.ladder.select(q_ucb, self.config.efficiency), 0
        self._inflight[w] = {"stage": "rate_sent", "qber": q, "rate_index": r,
                             "short_bits": s, "qber_bits": k}
        self.link.send(RateSelect(window_id=w, qber_milli=int(round(q * 1000)),
                                  rate_index=r, short_bits=s))

    def _on_syndromes(self, msg: Syndromes) -> None:
        w = msg.window_id
        st = self._inflight.get(w)
        if st is None or st["stage"] != "rate_sent":
            return  # duplicate or aborted window (state left untouched)
        assert st["rate_index"] == msg.rate_index
        assert st["short_bits"] == msg.short_bits
        r, q, s = msg.rate_index, st["qber"], msg.short_bits
        step = self.ladder.steps[r]
        assert msg.syndrome_bits == step.code.m
        pos = self._step_positions[r]
        prog = self.programs(r)
        B = self.config.blocks_per_window
        xmask = self._xshort_mask(r, w, s)
        stream = self._take(self.window_payload_bits(r, s)).reshape(B, -1)
        payload_rx = self._assemble_payload(stream, xmask, w)
        shortfill = self._shared_short_bits(w, pos["short"].size)
        mag = np.float32(np.log((1.0 - q) / q))

        # Dispatch the fused decode program and DEFER the result sync: the
        # device queues this window's decode behind earlier ones while the
        # host goes back to the link (framing/QBER work for later windows).
        out = prog.bob(
            jnp.asarray(payload_rx), jnp.asarray(xmask, jnp.uint8),
            jnp.asarray(shortfill), jnp.asarray(msg.syndromes),
            jnp.asarray(msg.verify_hashes), jnp.float32(mag),
            self._verify_key(w))
        if self._mesh is not None:
            payload_hat, stats_dev, gled = out
            st["gled_dev"] = gled
        else:
            payload_hat, stats_dev = out
            self.ledger.add(syndrome_bits=step.leaked_bits() * B,
                            verify_hash_bits=self.config.verify_hash_bits * B)
        st.update(stage="decoding", payload_rx=payload_rx, xmask=xmask,
                  shortfill=shortfill, syndromes=msg.syndromes,
                  expected_hashes=msg.verify_hashes,
                  payload_hat_dev=payload_hat, stats_dev=stats_dev, round=0,
                  extra_leak=np.zeros(B, np.int64))
        self._inflight[w] = st
        self._pending.append(w)

    def _resolve_decode(self, w: int, st: dict) -> None:
        """Second half of _on_syndromes: force the device results, ack."""
        B = self.config.blocks_per_window
        stats = np.asarray(st.pop("stats_dev"))  # ONE D2H: (B, 3) int32
        ok = stats[:, 0].astype(bool)
        st.update(stage="decoded", ok=ok, iters=stats[:, 1],
                  errs=stats[:, 2].astype(np.int64))
        if "gled_dev" in st:
            # Mesh mode: the decode-stage leakage comes from the device's
            # psum'd global ledger (the REAL accounting, BASELINE config 5);
            # reconciled/discarded stay with finalize (retries adjust them).
            from qtpu.accounting import LEDGER_FIELDS
            gled = np.asarray(st.pop("gled_dev"))
            self.last_gled = gled
            self.gled_by_window[w] = gled
            idx = {f: i for i, f in enumerate(LEDGER_FIELDS)}
            self.ledger.add(
                syndrome_bits=int(gled[idx["syndrome_bits"]]),
                verify_hash_bits=int(gled[idx["verify_hash_bits"]]))
        if (~ok).any() and self.config.max_retries > 0:
            # Keep the window in flight awaiting Alice's retry disclosure.
            self.link.send(VerifyAck(window_id=w, num_blocks=B,
                                     ok_mask=ok.astype(np.uint8), round=0,
                                     next_test_bits=self._next_test_request()))
            return
        self._inflight.pop(w, None)
        self._finalize_window(w, st)
        self.link.send(VerifyAck(window_id=w, num_blocks=B,
                                 ok_mask=ok.astype(np.uint8), round=0,
                                 next_test_bits=self._next_test_request()))
        self._sync_auth_bits()

    def _on_retry(self, msg) -> None:
        w = msg.window_id
        st = self._inflight.pop(w, None)
        if st is None or st.get("stage") != "decoded" or st["round"] != msg.round:
            if st is not None:
                self._inflight[w] = st
            return  # duplicate / out-of-order retry
        r = st["rate_index"]
        prog = self.programs(r)
        B = self.config.blocks_per_window
        failed = msg.failed_mask.astype(bool)
        P = st["payload_rx"].shape[1]
        positions = self._retry_positions(w, msg.round, P)
        assert len(positions) == msg.num_bits

        # Pin the disclosed bits: write Alice's values into failed rows and
        # extend the pin mask, then re-run the same fused program.  Rows that
        # were already ok keep their previous results (their pins would be
        # Bob's possibly-wrong bits, but their outputs are discarded).
        payload_rx2 = st["payload_rx"].copy()
        rows = np.flatnonzero(failed)
        payload_rx2[np.repeat(rows, len(positions)),
                    np.tile(positions, len(rows))] = msg.bits.reshape(-1)
        changed = (payload_rx2 != st["payload_rx"]).sum(axis=1)
        xmask2 = st["xmask"].copy()
        xmask2[positions] = True
        q = st["qber"]
        mag = np.float32(np.log((1.0 - q) / q))
        out = prog.bob(
            jnp.asarray(payload_rx2), jnp.asarray(xmask2, jnp.uint8),
            jnp.asarray(st["shortfill"]), jnp.asarray(st["syndromes"]),
            jnp.asarray(st["expected_hashes"]), jnp.float32(mag),
            self._verify_key(w))
        if self._mesh is not None:
            payload_hat2, stats2_dev, _ = out  # retry leakage is
            # charged from the RetryDisclose message below, not the gled
        else:
            payload_hat2, stats2_dev = out
        stats2 = np.asarray(stats2_dev)
        ok_new = stats2[:, 0].astype(bool)
        iters2, errs2 = stats2[:, 1], stats2[:, 2].astype(np.int64)
        # Previously-ok blocks keep their result; failed ones take the retry.
        ok = st["ok"] | (failed & ok_new)
        keep_prev = jnp.asarray(~failed)
        payload_final = jnp.where(keep_prev[:, None], st["payload_hat_dev"],
                                  payload_hat2)
        # Error counts: retried rows count decode-vs-received errors PLUS the
        # disclosed positions Alice's bits corrected in the rx copy.
        errs = np.where(failed, errs2 + changed, st["errs"])
        extra = st["extra_leak"]
        extra[failed] += msg.num_bits
        self.ledger.add(syndrome_bits=msg.num_bits * int(failed.sum()))
        st.update(payload_hat_dev=payload_final, ok=ok, round=msg.round + 1,
                  errs=errs,
                  iters=np.maximum(st["iters"], iters2))
        if (~ok).any() and st["round"] < self.config.max_retries:
            self._inflight[w] = st
            self.link.send(VerifyAck(window_id=w, num_blocks=B,
                                     ok_mask=ok.astype(np.uint8),
                                     round=st["round"],
                                     next_test_bits=self._next_test_request()))
            return
        self._finalize_window(w, st)
        self.link.send(VerifyAck(window_id=w, num_blocks=B,
                                 ok_mask=ok.astype(np.uint8),
                                 round=st["round"],
                                 next_test_bits=self._next_test_request()))
        self._sync_auth_bits()

    def _update_qber_prior(self, st: dict) -> None:
        """Fold the exact error counts of this window's verified blocks into
        the decaying QBER prior (free information: corrected vs received;
        the fused program returns per-block counts, so no payload leaves the
        device for this)."""
        ok = st["ok"]
        if not ok.any():
            return
        s = int(st["xmask"].sum())
        per_block = st["payload_rx"].shape[1] - s  # pinned positions can't err
        errs = float(st["errs"][ok].sum())
        self.qest.update_prior(errs, float(per_block * int(ok.sum())))

    def _finalize_window(self, w: int, st: dict) -> None:
        r = st["rate_index"]
        step = self.ladder.steps[r]
        B = self.config.blocks_per_window
        ok = st["ok"]
        s = st["short_bits"]
        self._update_qber_prior(st)
        iters = st["iters"]
        q = st["qber"]
        extra = st["extra_leak"]
        P = st["payload_rx"].shape[1]
        per_block_stream = P - s
        if self.config.pa_mode == "stream":
            final = self._stream_accumulate(st["payload_hat_dev"], ok, r, w,
                                            st["qber_bits"], s, extra)
        else:
            final = self._privacy_amplify(st["payload_hat_dev"], ok, r, w,
                                          st["qber_bits"], s,
                                          extra_leak=extra)
        self.ledger.add(reconciled_bits=int(ok.sum()) * per_block_stream,
                        discarded_bits=int((~ok).sum()) * per_block_stream,
                        final_bits=final, blocks_ok=int(ok.sum()),
                        blocks_failed=int((~ok).sum()))
        self.metrics.append(WindowMetrics(
            window_id=w, qber_est=float(q), rate_index=r,
            rate_eff=1.0 - step.leaked_bits() / per_block_stream, blocks=B,
            blocks_ok=int(ok.sum()), iters_mean=float(iters.mean()),
            iters_max=int(iters.max()), payload_bits=per_block_stream * B,
            leaked_syndrome=step.leaked_bits() * B,
            leaked_qber=st["qber_bits"],
            leaked_hash=self.config.verify_hash_bits * B,
            final_bits=final,
            blocks_retried=int((extra > 0).sum()),
            extra_short_bits=s))
        self.window_id = max(self.window_id, w + 1)


def run_loopback(config: PipelineConfig, alice_bits: np.ndarray,
                 bob_bits: np.ndarray, session_seed: int = 0x5E55):
    """Two-party loopback integration run (SURVEY.md §5.3): both sessions in
    one process over an in-memory link; returns (alice, bob) sessions."""
    from qtpu.link import make_loopback_pair
    la, lb = make_loopback_pair()
    alice = AliceSession(config, session_seed, la)
    bob = BobSession(config, session_seed, lb)
    alice.push_sifted(alice_bits)
    bob.push_sifted(bob_bits)
    # Pump until quiescent; deferred decodes resolve when the link drains.
    for _ in range(10_000):
        progressed = False
        if alice.can_start_window():
            alice.start_window()
            progressed = True
        m = lb.recv()
        if m is not None:
            bob.on_message(m)
            progressed = True
        m = la.recv()
        if m is not None:
            alice.on_message(m)
            progressed = True
        if not progressed and bob.flush():
            progressed = True
        if not progressed:
            break
    return alice, bob
