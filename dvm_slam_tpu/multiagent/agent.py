"""SlamAgent: the per-agent decentralized C-SLAM runtime.

TPU-native `OrbSlam3Wrapper` (`src/slam_system/src/orb_slam3_wrapper.cpp`):
owns a tracker + local mapper + BoW database + peer table + frame tree, and
runs the reference's per-frame protocol loop (`orb_slam3_wrapper.cpp:131-148`):

  updateSuccessfullyMerged -> updateIsLostFromBaseMap ->
  sendNewKeyFrameBows -> sendNewKeyFrames (+ 5s scale-alignment timer)

Protocol behavior reproduced (constants `orb_slam3_wrapper.cpp:36-38`):
  * BoW advertisement pre-merge: own new keyframes, >=5 per batch, >=12 KFs
    total (`:457-534`)
  * merge detection on the lead node only, 0.9x-baseline BoW rule, the
    higher agentId requests/merges so the merged map lands in the lower id's
    coordinate frame (`:536-618`, `System.cc:1386-1422`)
  * incremental keyframe sharing post-merge: own unsent KFs outside the
    3-KF culling window, >=5 per batch, pruned submap serialization
    (`:212-384`); receive = uuid-relinked splice + fuse + one local BA after
    the external batch drains (`LocalMapping.cc:302-354`)
  * SuccessfullyMerged broadcast with implicit transitive merges (`:620-731`)
  * lost-from-base-map gating (`:733-764`)
  * periodic RANSAC-Umeyama scale re-alignment vs the lowest merged peer,
    >=500 shared points, AIMD backoff (`:766-833`)
  * loop-closure trigger exchange (defined; like the reference, not called
    from the run loop — `sendLoopClosureTriggers` is dead code upstream)
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import alignment, lie
from ..loopclosing import merge as merge_mod
from ..mapping import local_mapping, map_state
from ..placerec import database, vocabulary
from ..tracking import tracker as trk
from . import codec, messages as msgs
from .peer import PeerTable
from .reference_frames import ReferenceFrameManager

MIN_KEY_FRAME_SHARE_SIZE = 5       # orb_slam3_wrapper.cpp:36
MIN_BOW_SHARE_SIZE = 5             # :37
MIN_MAP_POINTS_FOR_SCALE_ADJUSTMENT = 500  # :38
MIN_KEY_FRAMES_FOR_MERGE = 12      # :466,551
CULLING_WINDOW = 3                 # :243 (maxId - 3)
SCALE_ALIGN_BASE_INTERVAL = 5.0    # 5 s wall timer, :123

# sparse advertisement entries per keyframe, compacted ON DEVICE: a dense
# [pad, W] readback is ~320 KB over the tunnel per batch; top-k is ~8 KB.
# 1024 >= the feature budget, so compaction is exact (each feature votes
# one word; a BoW has at most n_features nonzeros)
_BOW_NZ = 1024

def _bow_sparse_impl(bows, nz: int):
    vals, keys = jax.lax.top_k(bows, nz)
    return keys.astype(jnp.int32), vals


@partial(jax.jit, static_argnames=("branch", "n_words", "nz", "with_scale"))
def _protocol_chunk(levels, idf, m, db, key, idx, own_rows, own_slots, K,
                    branch: int, n_words: int, nz: int, with_scale: bool):
    """The whole per-retire protocol computation as ONE dispatch: BoW
    transform of the chunk's keyframes, database registration, sparse
    advertisement compaction, covisibility, and the loop-detection verdicts.

    Fusing matters on top of what XLA fuses: dispatched separately, each
    call's argument upload pays the tunnel relay's round-trip latency
    (~140 ms once the relay enters readback mode), so a keyframe retire
    cost ~700 ms of host blocking across 5 calls (measured,
    benchmarks/agent_profile.py AGENT_PROFILE_TRACE=1). One dispatch pays
    it once, and on local hardware removes 4 dispatch overheads."""
    from ..loopclosing.loop_detector import detect_verdict_batch

    bows = jax.vmap(
        vocabulary.bow_vector, in_axes=(None, None, 0, 0, None, None)
    )(levels, idf, m.kf_desc[idx], m.kf_feat_valid[idx], branch, n_words)
    db2 = database.add_many(db, idx, bows)
    keys_s, vals_s = _bow_sparse_impl(bows, nz)
    covis = map_state.covisibility(m)
    all_keys = jax.random.split(key, idx.shape[0] + 1)
    rows = detect_verdict_batch(
        all_keys[1:], m, db2, covis, bows[own_rows], own_slots, K,
        with_scale=with_scale,
    )
    return db2, all_keys[0], keys_s, vals_s, rows


def _dev_ready(a):
    """Non-blocking: has this device array's async readback landed?"""
    try:
        return a.is_ready()
    except AttributeError:  # backends without is_ready: treat as done
        return True


class SlamAgent:
    def __init__(self, agent_id: int, config: trk.TrackerConfig, K, dist,
                 voc: vocabulary.Vocabulary, transport, peer_ids,
                 mapper: local_mapping.LocalMapper | None = None,
                 rng_seed: int | None = None,
                 post_merge_pose_graph: bool = True,
                 post_merge_global_ba: bool = True,
                 autonomous: bool = True, auto_batch: int = 4,
                 async_depth: int = 8,
                 loop_correction: bool = False,
                 proto_pad: int = 2):
        # post-merge optimization stages of `LoopClosing::MergeLocal` —
        # default ON to match the reference, which always runs the welding
        # BA *plus* essential-graph optimization *plus* a GBA thread on
        # every merge (`LoopClosing.cc:1657,1747,1796`)
        self.post_merge_pose_graph = post_merge_pose_graph
        self.post_merge_global_ba = post_merge_global_ba
        # intra-map loop CORRECTION is disabled upstream (`LoopClosing.cc:
        # 328-339` comments out CorrectLoop(); triggers are only recorded) —
        # default False for parity. True applies the opt-in Sim3 essential-
        # graph correction on a confirmed trigger; benchmarks/long_ate.py
        # measures what the disabled path costs (VERDICT r3 item 7).
        self.loop_correction = loop_correction
        # fixed chunk shape of the per-retire protocol dispatch — ONE
        # compiled program for BoW registration + loop verdicts regardless
        # of how many keyframes retire at once (see _update_bow_db)
        self.proto_pad = max(1, int(proto_pad))
        self.agent_id = agent_id
        self.config = config
        self.voc = voc
        self.voc_levels, self.voc_idf = voc.device_arrays()
        mapper = mapper or local_mapping.LocalMapper()
        self.tracker = trk.MonocularTracker(
            config, K, dist, local_mapper=mapper,
            rng_seed=agent_id if rng_seed is None else rng_seed,
        )
        self.tracker.meta.agent_id = agent_id
        # production overlap (reference: tracking/mapping/loop threads are
        # always overlapped, System.cc:209,226,245): the device-autonomous
        # lane is the default for visual agents; merges/rebases exit it and
        # auto_mode re-enters on the next healthy frame
        if autonomous and not self.tracker.inertial:
            self.tracker.auto_mode = True
            self.tracker.auto_batch = auto_batch
            self.tracker.async_depth = async_depth
        self.peers = PeerTable(agent_id, peer_ids)
        self.transport = transport
        transport.register(agent_id)
        transport.register_service(agent_id, msgs.SRV_GET_CURRENT_MAP,
                                   self._srv_get_current_map)
        transport.register_service(agent_id, msgs.SRV_GET_MAP_POINTS,
                                   self._srv_get_map_points)
        self.frames = ReferenceFrameManager(agent_id)
        self.db = database.create(config.kf_cap, voc.n_words)
        from ..tracking.relocalization import RelocalizationService
        self.tracker.relocalizer = RelocalizationService(
            voc, K, config.frontend.sigma2, kf_cap=config.kf_cap,
        )
        from ..loopclosing.loop_detector import LoopDetector
        self.loop_detector = LoopDetector(
            voc, K, fix_scale=self.tracker.config.depth_sensor)
        self._db_slots = set()
        self._kf_bows = {}          # slot -> sparse (keys, values) bow (own KFs)
        # host mirror of map.kf_valid: refreshed ONCE per tracker.map_epoch
        # (merge/splice/atlas/GBA-fold — paths that already block on the
        # device); between epochs kf slots are append-only valid, so the
        # protocol loop never issues a per-frame kf_valid readback (each one
        # would serialize the whole in-flight autonomous dispatch chain)
        self._kf_valid_host = np.zeros(config.kf_cap, bool)
        self._kf_valid_n = 0
        self._kf_valid_epoch = self.tracker.map_epoch
        self.key = jax.random.PRNGKey(1000 + agent_id)
        self._was_lost = False
        self._scale_interval = SCALE_ALIGN_BASE_INTERVAL
        self._next_scale_ts = SCALE_ALIGN_BASE_INTERVAL
        self._peer_merges = set()   # frozenset({a,b}) merge announcements seen
        # in-flight post-merge global BA (the reference's detached GBA thread
        # with its mbStopGBA abort, LoopClosing.cc:1796-1799): the dispatch
        # is asynchronous on the device; the protocol loop polls and folds
        # the result back in when ready, and any map rebase/splice/newer
        # merge supersedes (aborts) it
        self._pending_gba = None
        # in-flight protocol records (BoW registration + loop-detection
        # verdicts): dispatched as pure device work when keyframes retire,
        # folded back a few frames later when the async readback lands —
        # same pattern as _pending_gba. The round-3 loop instead pulled
        # `np.asarray(bows)` + 2-3 `bool(...)` verdicts per keyframe, each
        # serializing the whole in-flight autonomous dispatch chain.
        self._pending_protocol = []
        self.log = []

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def process_image(self, img, ts: float):
        pose = self.tracker.process_image(img, ts)
        self.run_once(ts)
        return pose

    def flush(self):
        """End-of-stream barrier: dispatch buffered autonomous frames,
        retire all pending bookkeeping, fold in any in-flight global BA.
        Call when the frame source ends (the reference's run loop just keeps
        spinning; a finite replay needs an explicit drain)."""
        self.tracker.drain_auto()
        self.tracker.flush_meta()
        self._update_bow_db()            # register keyframes the drain retired
        self._poll_protocol(block=True)
        self._poll_gba(block=True)

    def run_once(self, ts: float):
        """One protocol-loop iteration (`orb_slam3_wrapper.cpp:131-148`)."""
        self._poll_gba()
        self._update_bow_db()
        self._drain_channels(ts)
        self._update_is_lost()
        if not self._is_lost():
            self._send_new_key_frame_bows()
            self._send_new_key_frames()
            if ts >= self._next_scale_ts:
                self._update_map_scale(ts)

    # ------------------------------------------------------------------
    # bookkeeping
    # ------------------------------------------------------------------

    @property
    def map(self):
        return self.tracker.map

    @property
    def meta(self):
        return self.tracker.meta

    def _is_lost(self):
        return self.tracker.state in (trk.RECENTLY_LOST, trk.LOST)

    def _host_kf_valid(self, n: int):
        """kf_valid[:n] from the host mirror — no device sync on the normal
        path (see __init__ note). `n` must come from tracker.n_kf_host."""
        if self._kf_valid_epoch != self.tracker.map_epoch:
            self._kf_valid_host = np.array(np.asarray(self.map.kf_valid))
            self._kf_valid_n = n
            self._kf_valid_epoch = self.tracker.map_epoch
        if n > self._kf_valid_n:
            self._kf_valid_host[self._kf_valid_n:n] = True
            self._kf_valid_n = n
        return self._kf_valid_host[:n]

    def check_invariants(self):
        """Debug/test barrier: assert the host kf_valid mirror matches the
        device array. The mirror's correctness rests on two conventions
        (see `_host_kf_valid`): (a) no code path clears kf_valid between
        map_epoch bumps, and (b) every wholesale map rebuild (merge, splice,
        atlas swap, GBA fold) bumps `tracker.map_epoch`. A future KF-culling
        or map-surgery path that forgets the bump would silently desync the
        mirror — this check (cheap: one readback) catches that in tests.
        Syncs the device, so never call it on the per-frame path."""
        self.tracker.drain_auto()
        n = self.tracker.n_kf_host
        host = self._host_kf_valid(n)
        dev = np.asarray(self.map.kf_valid)[:n]
        if not bool((host == dev).all()):
            bad = np.nonzero(host != dev)[0]
            raise AssertionError(
                f"host kf_valid mirror desynced at slots {bad[:8].tolist()} "
                f"(epoch {self._kf_valid_epoch} vs map_epoch "
                f"{self.tracker.map_epoch}): a map-surgery path forgot to "
                f"bump tracker.map_epoch")
        return True

    def _own_kf_slots(self):
        n = self.tracker.n_kf_host
        valid = self._host_kf_valid(n)
        creators = self.meta.kf_creator[:n]
        return [i for i in range(n) if valid[i] and creators[i] == self.agent_id]

    def _update_bow_db(self):
        """Register BoWs of all new valid keyframes (own and spliced) and
        dispatch own-map loop detection — ALL device work, folded back
        asynchronously by `_poll_protocol` (triggers recorded, correction
        disabled like the reference, LoopClosing.cc:328-339).

        Batched: one padded device call per frame instead of a per-slot
        loop — at 512-KF caps x 8 agents the per-slot dispatch dominated
        the protocol loop. The pad is ONE fixed chunk shape (`proto_pad`,
        default 2), bursts run multiple chunks: round 3/4's floor-8 pad
        made the steady one-new-KF retire pay 8 Sim3-RANSAC verifies on
        the tracking stream, and round 5's first fix (exact pow2 pads)
        was worse — every first-seen shape {1,2,4,8} cost a fresh XLA
        compile MID-RUN (measured 10.7 s worst frame,
        benchmarks/agent_profile.py). One fixed shape compiles once at
        warmup; the steady case pays a 2x verify pad and flush bursts
        pay ceil(k/2) cheap extra dispatches. Each chunk is ONE fused
        device call (`_protocol_chunk`) — separate calls each paid the
        tunnel relay round-trip, ~700 ms/retire total."""
        self._poll_protocol()
        # only slots whose host metadata has retired: in autonomous mode the
        # device KF counter runs ahead of uuid/creator assignment, and a
        # slot registered before its creator is known would be mis-skipped
        # by the own-KF bookkeeping forever (slots enter _db_slots once).
        # n_kf_host (<= device n_kf always) and the host valid mirror keep
        # this scan free of device readbacks on frames with nothing new.
        n = self.tracker.n_kf_host
        valid = self._host_kf_valid(n)
        new_slots = [s for s in range(n)
                     if s not in self._db_slots and valid[s]]
        if not new_slots:
            return
        P = self.proto_pad
        for c0 in range(0, len(new_slots), P):
            chunk = new_slots[c0:c0 + P]
            k = len(chunk)
            # duplicate padded slots are harmless: add_many is a scatter-set
            idx = np.asarray(chunk + [chunk[-1]] * (P - k), np.int32)
            own = [(i, s) for i, s in enumerate(chunk)
                   if self.meta.kf_creator[s] == self.agent_id]
            if own:
                own_rows = np.asarray(
                    [i for i, _ in own] + [own[-1][0]] * (P - len(own)),
                    np.int32)
                own_slots = np.asarray(
                    [s for _, s in own] + [own[-1][1]] * (P - len(own)),
                    np.int32)
            else:  # verdicts discarded; keeps the single compiled shape
                own_rows = np.zeros(P, np.int32)
                own_slots = idx
            self.db, self.key, keys_s, vals_s, rows = _protocol_chunk(
                self.voc_levels, self.voc_idf, self.map, self.db, self.key,
                idx, own_rows, own_slots, self.tracker.K,
                branch=self.voc.branch, n_words=self.voc.n_words,
                nz=min(_BOW_NZ, self.voc.n_words),
                with_scale=not self.loop_detector.fix_scale,
            )
            self._db_slots.update(chunk)
            if not own:
                continue
            for a in (keys_s, vals_s, rows):
                a.copy_to_host_async()
            self._pending_protocol.append({
                "own": own, "keys": keys_s, "vals": vals_s, "rows": rows,
                "epoch": self.tracker.map_epoch,
            })

    def _poll_protocol(self, block: bool = False):
        """Fold completed protocol records (sparse BoWs for advertisement +
        loop-detection verdicts) back into the host state. Non-blocking by
        default: a record whose readback hasn't landed stays queued (FIFO —
        the loop detector's consistency streak needs keyframe order)."""
        while self._pending_protocol:
            rec = self._pending_protocol[0]
            if not block and not all(
                _dev_ready(rec[a]) for a in ("keys", "vals", "rows")
            ):
                return
            self._pending_protocol.pop(0)
            keys_np = np.asarray(rec["keys"])
            vals_np = np.asarray(rec["vals"])
            rows_np = np.asarray(rec["rows"])
            for j, (i, slot) in enumerate(rec["own"]):
                nz = vals_np[i] > 0
                self._kf_bows[slot] = (keys_np[i][nz].astype(np.int64),
                                       vals_np[i][nz].astype(np.float64))
                # verdicts computed against a superseded slot layout are
                # dropped (a merge/splice bumped map_epoch mid-flight);
                # the bows stay — advertisement is uuid-keyed and own-KF
                # slots are stable across the merge paths that bump epoch
                if rec["epoch"] == self.tracker.map_epoch:
                    found, info = self.loop_detector.fold(
                        rows_np[j], self.meta, slot)
                    if found:
                        self.log.append(("loop_trigger", slot, info["match"]))
                        if self.loop_correction:
                            self._apply_loop_correction(slot, info)

    def _apply_loop_correction(self, slot: int, info):
        """Opt-in intra-map loop correction (`CorrectLoop` role, disabled
        upstream): Sim3 essential-graph optimization anchored at the matched
        (older) keyframe, then the tracker continuation follows the moved
        query keyframe."""
        self._abort_gba("loop_correction")
        self.tracker.exit_autonomous()
        self.tracker.flush_meta()
        old_kf_pose = self.map.kf_pose[slot]
        corrected = self.loop_detector.correct_loop(
            self.map, slot, int(info["match"]), jnp.asarray(info["S"]))
        corr = lie.se3_mul(lie.se3_inv(old_kf_pose), corrected.kf_pose[slot])
        self.tracker.map = corrected
        self.tracker.last_pose = lie.se3_mul(
            jnp.asarray(self.tracker.last_pose), corr)
        self.tracker.velocity = lie.se3_identity()
        self.tracker.map_epoch += 1
        self.log.append(("loop_corrected", slot, int(info["match"])))

    def _slot_of_kf_uuid(self, uuid_pair):
        n = int(self.map.n_kf)
        match = np.all(
            self.meta.kf_uuid[:n] == np.asarray(uuid_pair, np.uint64), axis=1
        )
        idx = np.nonzero(match)[0]
        return int(idx[0]) if len(idx) else -1

    # ------------------------------------------------------------------
    # outbound protocol
    # ------------------------------------------------------------------

    def _send_new_key_frame_bows(self):
        """BoW advertisement to not-yet-merged peers (`:457-534`)."""
        own = self._own_kf_slots()
        if len(own) < MIN_KEY_FRAMES_FOR_MERGE:
            return
        for peer in self.peers:
            if peer.successfully_merged or peer.is_lost_from_base_map:
                continue
            fresh = []
            for slot in own:
                u = msgs.uuid_key(self.meta.kf_uuid[slot])
                if u in peer.sent_key_frame_bow_uuids or slot not in self._kf_bows:
                    continue  # bow still in flight: advertised next round
                keys, vals = self._kf_bows[slot]
                fresh.append((u, msgs.KeyFrameBowVector(
                    uuid=u, keys=keys, values=vals
                )))
            if len(fresh) < MIN_BOW_SHARE_SIZE:
                continue
            self.transport.publish(
                self.agent_id, peer.agent_id, msgs.CH_NEW_KEY_FRAME_BOWS,
                msgs.NewKeyFrameBows(self.agent_id, [b for _, b in fresh]),
            )
            peer.sent_key_frame_bow_uuids.update(u for u, _ in fresh)

    def _sharable_own_slots(self, peer):
        """Own KFs not yet sent, outside the 3-KF culling window (`:240-247`)."""
        own = self._own_kf_slots()
        if not own:
            return []
        max_slot = max(own)
        out = []
        for slot in own:
            if slot > max_slot - CULLING_WINDOW:
                continue
            u = msgs.uuid_key(self.meta.kf_uuid[slot])
            if u in peer.sent_key_frame_uuids:
                continue
            out.append(slot)
        return out

    def _send_new_key_frames(self):
        """Incremental sharing to merged peers (`:212-384`)."""
        if not any(p.successfully_merged and not p.is_lost_from_base_map
                   for p in self.peers):
            return  # nothing to share — keep the frame loop free of syncs
        self.tracker.flush_meta()
        for peer in self.peers:
            if not peer.successfully_merged or peer.is_lost_from_base_map:
                continue
            slots = self._sharable_own_slots(peer)
            if len(slots) < MIN_KEY_FRAME_SHARE_SIZE:
                continue
            mask = np.zeros(self.map.kf_capacity, bool)
            mask[slots] = True
            packet = codec.extract_submap(self.map, self.meta, mask)
            self.transport.publish(
                self.agent_id, peer.agent_id, msgs.CH_NEW_KEY_FRAMES,
                msgs.NewKeyFrames(self.agent_id, packet.to_bytes()),
            )
            peer.sent_key_frame_uuids.update(
                msgs.uuid_key(u) for u in packet.kf_uuid
            )
            peer.sent_map_point_uuids.update(
                msgs.uuid_key(u) for u in packet.pt_uuid
            )

    def send_loop_closure_triggers(self, trigger_uuids):
        """Parity with `sendLoopClosureTriggers` (`:862-918`) — present but,
        as in the reference, never invoked from the run loop."""
        for peer in self.peers:
            if not peer.successfully_merged:
                continue
            fresh = [u for u in trigger_uuids
                     if u not in peer.sent_loop_closure_trigger_uuids]
            if not fresh:
                continue
            self.transport.publish(
                self.agent_id, peer.agent_id, msgs.CH_LOOP_CLOSURE_TRIGGERS,
                msgs.LoopClosureTriggers(self.agent_id, fresh),
            )
            peer.sent_loop_closure_trigger_uuids.update(fresh)

    def _update_is_lost(self):
        lost = self._is_lost()
        if lost != self._was_lost:
            self.transport.publish(
                self.agent_id, None, msgs.CH_IS_LOST,
                msgs.IsLostFromBaseMap(self.agent_id, lost),
            )
            self._was_lost = lost

    # ------------------------------------------------------------------
    # inbound protocol
    # ------------------------------------------------------------------

    def _drain_channels(self, ts):
        for sender, m in self.transport.poll(self.agent_id, msgs.CH_IS_LOST):
            if m.sender_agent_id in self.peers.peers:
                self.peers[m.sender_agent_id].is_lost_from_base_map = m.is_lost
        for sender, m in self.transport.poll(self.agent_id, msgs.CH_SUCCESSFULLY_MERGED):
            self._receive_successfully_merged(m)
        for sender, m in self.transport.poll(self.agent_id, msgs.CH_CHANGE_COORDINATE_FRAME):
            self._receive_change_coordinate_frame(m)
        for sender, m in self.transport.poll(self.agent_id, msgs.CH_NEW_KEY_FRAME_BOWS):
            self._receive_new_key_frame_bows(m)
        for sender, m in self.transport.poll(self.agent_id, msgs.CH_MAP_TO_ATTEMPT_MERGE):
            self._receive_map_to_attempt_merge(m)
        for sender, m in self.transport.poll(self.agent_id, msgs.CH_NEW_KEY_FRAMES):
            self._receive_new_key_frames(m)
        for sender, m in self.transport.poll(self.agent_id, msgs.CH_LOOP_CLOSURE_TRIGGERS):
            pass  # triggers re-enqueue loop KFs; loop correction is disabled
                  # upstream (LoopClosing.cc:329) — recorded for parity

    def _receive_new_key_frame_bows(self, m: msgs.NewKeyFrameBows):
        """Merge-candidate detection (`:536-618`): lead node only, both maps
        >= 12 KFs, 0.9x-baseline BoW rule."""
        if not self.peers.is_lead_node():
            return
        self.tracker.flush_meta()
        peer = self.peers[m.sender_agent_id]
        if peer.successfully_merged:
            return
        if len(self._own_kf_slots()) < MIN_KEY_FRAMES_FOR_MERGE:
            return
        covis = map_state.covisibility(self.map)
        candidates = []
        for bow in m.bows:
            q = jnp.zeros((self.voc.n_words,), jnp.float32).at[
                jnp.asarray(bow.keys, jnp.int32)
            ].set(jnp.asarray(bow.values, jnp.float32))
            ok, best, score, baseline = database.detect_merge_possibility(
                self.db, q, covis
            )
            if bool(ok):
                candidates.append((bow.uuid, int(best), float(score)))
        if not candidates:
            return
        self.log.append(("merge_candidates", m.sender_agent_id, len(candidates)))
        if self.agent_id > m.sender_agent_id:
            # higher id pulls the peer's map and performs the merge so the
            # shared frame is the lower id's (System.cc:1392-1421)
            resp = self.transport.call(
                self.agent_id, m.sender_agent_id, msgs.SRV_GET_CURRENT_MAP,
                msgs.GetCurrentMapRequest(self.agent_id, [c[0] for c in candidates]),
            )
            if resp is not None:
                self._attempt_merge(m.sender_agent_id, resp.serialized_map,
                                    [c[0] for c in candidates])
        else:
            # lower id pushes its own map to the peer, who merges into OUR frame
            own = self._own_kf_slots()
            mask = np.zeros(self.map.kf_capacity, bool)
            mask[own] = True
            packet = codec.extract_submap(self.map, self.meta, mask)
            self.transport.publish(
                self.agent_id, m.sender_agent_id, msgs.CH_MAP_TO_ATTEMPT_MERGE,
                msgs.MapToAttemptMerge(self.agent_id, packet.to_bytes(),
                                       [c[0] for c in candidates]),
            )

    def _receive_map_to_attempt_merge(self, m: msgs.MapToAttemptMerge):
        self._attempt_merge(m.sender_agent_id, m.serialized_map,
                            m.merge_candidate_key_frame_uuids)

    def _attempt_merge(self, peer_id: int, blob: bytes, candidate_uuids):
        """Deserialize a foreign map and try Sim3 merge on the candidate
        keyframes (`System::AddSerializedMapToTryMerge` + LoopClosing merge)."""
        # map surgery ahead: leave the device-autonomous lane (auto_mode
        # re-enters automatically on the next healthy frame)
        self.tracker.exit_autonomous()
        self.tracker.flush_meta()
        if self.peers[peer_id].successfully_merged:
            return False  # a second in-flight copy of an already-done merge
        packet = codec.MapPacket.from_bytes(blob)
        mB, metaB = codec.materialize(packet, self.config.frontend.capacity)

        # candidate pairs: candidate uuid may name either side's keyframe
        fc = self.config.frontend
        tried = 0
        for cu in candidate_uuids:
            # find the foreign KF with this uuid, else treat as local
            match = np.all(packet.kf_uuid == np.asarray(cu, np.uint64), axis=1)
            fidx = np.nonzero(match)[0]
            if len(fidx):
                kfB = int(fidx[0])
                # best local match by BoW
                bowB = vocabulary.bow_vector(
                    self.voc_levels, self.voc_idf, mB.kf_desc[kfB],
                    mB.kf_feat_valid[kfB], self.voc.branch, self.voc.n_words,
                )
                covis = map_state.covisibility(self.map)
                _, kfA = database.best_group_match(
                    self.db, bowB, jnp.zeros(self.db.valid.shape, bool), covis
                )
                kfA = int(kfA)
            else:
                kfA = self._slot_of_kf_uuid(cu)
                if kfA < 0:
                    continue
                bowA = vocabulary.bow_vector(
                    self.voc_levels, self.voc_idf, self.map.kf_desc[kfA],
                    self.map.kf_feat_valid[kfA], self.voc.branch, self.voc.n_words,
                )
                # best foreign match by plain score
                scores = [float(vocabulary.l1_score(bowA, vocabulary.bow_vector(
                    self.voc_levels, self.voc_idf, mB.kf_desc[j],
                    mB.kf_feat_valid[j], self.voc.branch, self.voc.n_words,
                )[None])[0]) for j in range(packet.n_kf)]
                kfB = int(np.argmax(scores))
            tried += 1
            self.key, sub = jax.random.split(self.key)
            # depth sensors give metric maps -> fix scale (Sim3Solver
            # bFixScale, `LoopClosing.cc:785`)
            res = merge_mod.compute_sim3_between(
                sub, self.map, jnp.int32(kfA), mB, jnp.int32(kfB),
                self.tracker.K,
                with_scale=not self.tracker.config.depth_sensor,
            )
            if not bool(res.ok):
                continue
            if self.tracker.inertial and self.tracker.imu_initialized:
                # inertial maps are metric: reject scale outside [0.90, 1.1]
                # (`LoopClosing.cc:151`)
                sc = float(res.S_ab[7])
                if not (0.90 <= sc <= 1.1):
                    self.log.append(("merge_scale_rejected", peer_id, sc))
                    continue
            self._do_merge(peer_id, mB, metaB, res.S_ab, kfA)
            return True
        self.log.append(("merge_failed", peer_id, tried))
        return False

    def _do_merge(self, peer_id: int, mB, metaB, S_ab, weld_kf: int):
        """Splice the foreign map in; the merged group's common frame is the
        LOWER agent id's world (`System.cc:1392-1421`). If the peer has the
        lower id, re-base our whole map into their frame first and announce
        the frame change to our current group (`:920-999`)."""
        fc = self.config.frontend
        t_merge0 = time.perf_counter()
        # a newer merge supersedes any in-flight GBA (mbStopGBA role)
        self._abort_gba("superseded_by_merge")
        if peer_id < self.agent_id:
            S_ba = lie.sim3_inv(jnp.asarray(S_ab))  # my world -> their world
            self._apply_frame_change(peer_id, S_ba)
            S_for_splice = lie.sim3_identity()
        else:
            S_for_splice = jnp.asarray(S_ab)

        merged, meta, kf_map, pt_map = merge_mod.merge_maps(
            self.map, self.meta, mB, metaB, S_for_splice
        )
        # pre-correction poses: the relative transforms between them are the
        # essential-graph edge *measurements* (the reference's
        # NonCorrectedSim3 side of OptimizeEssentialGraph, Optimizer.cc:1389)
        poses_pre = merged.kf_pose
        merged = local_mapping.fuse_duplicates(
            merged, jnp.int32(weld_kf), self.tracker.K,
            n_neighbors=5, n_levels=fc.n_levels, scale_factor=fc.scale_factor,
        )
        mapper = self.tracker.local_mapper
        if (self.tracker.inertial and self.tracker.imu_initialized
                and mapper is not None and len(self.tracker.kf_chain) >= 2):
            # MergeInertialBA (`Optimizer.cc:3676`, called from MergeLocal2,
            # `LoopClosing.cc:1811`): after an inertial merge the welding BA
            # is the JOINT visual-inertial problem — the own keyframe chain
            # (poses + velocities + biases + preintegration edges) is
            # re-estimated against the welded geometry (spliced peer points
            # anchor the weld; their keyframes stay fixed), instead of the
            # visual-only window BA. Velocity/bias continuity across the
            # weld comes from the preintegration factors re-solved here.
            saved = self.tracker.map
            self.tracker.map = merged
            merged = mapper._vi_local_ba(self.tracker, weld_kf)
            self.tracker.map = saved
        else:
            merged, _ = local_mapping.local_ba(
                merged, jnp.int32(weld_kf), self.tracker.K,
                n_local=12, n_fixed=8, n_pts=2048, iters=6,
                n_levels=fc.n_levels, scale_factor=fc.scale_factor,
            )
        if self.post_merge_pose_graph:
            merged = self._run_pose_graph(merged, weld_kf, poses_pre)
        self.tracker.map = merged
        self.tracker.meta = meta
        self.tracker.n_kf_host = int(merged.n_kf)
        self.tracker.map_epoch += 1  # slot layout changed: refresh mirrors
        if self.post_merge_global_ba:
            # full-map GBA (matrix-free Schur PCG — no KF/point truncation),
            # the role of the reference's *detached* GBA thread
            # (LoopClosing.cc:1796): dispatch asynchronously — the device
            # stream runs it behind the protocol's own work, the host does
            # NOT block; run_once polls and folds the result in at retire
            # (see _poll_gba / local_mapping.apply_gba_correction)
            self._dispatch_gba(merged, weld_kf)

        peer = self.peers[peer_id]
        peer.successfully_merged = True
        self._peer_merges.add(frozenset({self.agent_id, peer_id}))
        peer.sent_key_frame_uuids.update(
            msgs.uuid_key(u) for u in metaB.kf_uuid[: int(mB.n_kf)]
        )
        peer.sent_map_point_uuids.update(
            msgs.uuid_key(u) for u in metaB.pt_uuid[: int(mB.n_pt)]
        )
        n = int(merged.n_kf)
        all_uuids = [msgs.uuid_key(u) for u in meta.kf_uuid[:n]]
        self.transport.publish(
            self.agent_id, None, msgs.CH_SUCCESSFULLY_MERGED,
            msgs.SuccessfullyMerged(
                sender_agent_id=self.agent_id, receiver_agent_id=peer_id,
                successfully_merged=True,
                merged_key_frame_uuids=[msgs.uuid_key(u) for u in metaB.kf_uuid[: int(mB.n_kf)]],
                all_key_frames_in_map=all_uuids,
            ),
        )
        self.log.append(("merged", peer_id))
        # merge-path latency EXCLUDING the async GBA (which runs behind the
        # protocol loop) — the number the reference's threading hides too
        self.log.append(
            ("merge_latency_s", round(time.perf_counter() - t_merge0, 4)))

    def _run_pose_graph(self, m, anchor_kf: int, poses_pre):
        """Sim3 essential-graph optimization over the merged map
        (`Optimizer::OptimizeEssentialGraph` via loopclosing.pose_graph).

        Edge measurements come from `poses_pre` — the poses at splice time,
        BEFORE the welding local BA corrected the window around `anchor_kf`
        (the reference's NonCorrectedSim3). Nodes the welding BA moved are
        held fixed (CorrectedSim3 side); the optimization then distributes
        their correction through the rest of the graph instead of being a
        no-op on zero residuals."""
        from ..loopclosing import pose_graph

        covis = map_state.covisibility(m)
        Kcap = m.kf_capacity
        parent = pose_graph.compute_spanning_tree(covis, np.asarray(m.kf_valid))
        ei, ej = pose_graph.build_essential_edges(
            covis, np.asarray(m.kf_valid), min_weight=50,
            spanning_parent=parent,
        )
        if len(ei) == 0:
            return m
        poses = jax.vmap(lie.sim3_from_se3)(m.kf_pose)
        meas_src = jax.vmap(lie.sim3_from_se3)(poses_pre)
        meas = jax.vmap(
            lambda a, b: lie.sim3_mul(meas_src[a], lie.sim3_inv(meas_src[b]))
        )(jnp.asarray(ei), jnp.asarray(ej))
        corrected = np.any(
            np.asarray(m.kf_pose) != np.asarray(poses_pre), axis=1
        )  # the welding window the local BA moved
        fixed = jnp.asarray(corrected).at[0].set(True).at[anchor_kf].set(True)
        fixed = fixed | ~m.kf_valid
        if bool(jnp.all(fixed)):
            return m  # nothing free to distribute the correction to
        new_poses, _ = pose_graph.optimize_pose_graph(
            poses, fixed, jnp.asarray(ei), jnp.asarray(ej), meas,
            jnp.ones((len(ei),), bool), iters=12,
        )
        pts = pose_graph.correct_points(m.pt_pos, m.pt_ref_kf, m.pt_valid,
                                        poses, new_poses)
        return m._replace(
            kf_pose=jnp.where(m.kf_valid[:, None],
                              pose_graph.se3_from_sim3_poses(new_poses),
                              m.kf_pose),
            pt_pos=pts,
        )

    # ------------------------------------------------------------------
    # asynchronous post-merge global BA (`LoopClosing.cc:1796-1799`:
    # `new thread(&LoopClosing::RunGlobalBundleAdjustment, ...)` with the
    # `mbStopGBA` abort). On TPU the "thread" is the device's async
    # dispatch stream: the host enqueues the full-map solve and keeps
    # running the protocol loop; the poll folds the result into the live
    # (possibly grown) map, and any rebase/splice/newer merge aborts it.
    # ------------------------------------------------------------------

    def _dispatch_gba(self, merged, weld_kf: int):
        fc = self.config.frontend
        bf = (float(self.tracker.K[0]) * self.config.baseline
              if self.config.depth_sensor else None)
        res, _ = local_mapping.global_ba(
            merged, self.tracker.K, iters=8,
            n_levels=fc.n_levels, scale_factor=fc.scale_factor, bf=bf,
        )
        self._pending_gba = {
            "res_pose": res.kf_pose, "res_pt": res.pt_pos,
            "n_kf": int(merged.n_kf), "n_pt": int(merged.n_pt),
            "anchor": int(weld_kf), "t0": time.perf_counter(),
        }

    def _gba_ready(self):
        pg = self._pending_gba
        try:
            return pg["res_pose"].is_ready() and pg["res_pt"].is_ready()
        except AttributeError:  # backends without is_ready: treat as done
            return True

    def _poll_gba(self, block: bool = False):
        if self._pending_gba is None:
            return
        if not block and not self._gba_ready():
            return
        pg, self._pending_gba = self._pending_gba, None
        # map surgery: leave the autonomous lane first (auto_mode re-enters)
        self.tracker.exit_autonomous()
        self.tracker.flush_meta()
        if int(self.map.n_kf) < pg["n_kf"]:
            # the live map shrank (atlas stash-on-LOST swapped in a fresh
            # submap): the snapshot no longer describes these slots
            self.log.append(("gba_aborted", "map_replaced"))
            return
        # the tracker continuation must move with the map: compose the same
        # anchor correction that apply_gba_correction applies to post-
        # snapshot keyframes (T' = T . T_anchor_live^-1 . T_anchor_gba) into
        # last_pose, or the next motion-model prediction starts from a pose
        # in the pre-correction frame and tracking jumps. velocity is a
        # relative delta (T_next . T_prev^-1) and is invariant under the
        # right-composition, so it needs no fix-up.
        corr = lie.se3_mul(lie.se3_inv(self.map.kf_pose[pg["anchor"]]),
                           pg["res_pose"][pg["anchor"]])
        self.tracker.map = local_mapping.apply_gba_correction(
            self.map, pg["res_pose"], pg["res_pt"],
            jnp.int32(pg["n_kf"]), jnp.int32(pg["n_pt"]),
            jnp.int32(pg["anchor"]),
        )
        self.tracker.last_pose = lie.se3_mul(
            jnp.asarray(self.tracker.last_pose), corr)
        self.log.append(("gba_applied",
                         round(time.perf_counter() - pg["t0"], 4)))

    def flush_gba(self):
        """Block until any in-flight global BA is folded in (end-of-run /
        pre-evaluation barrier)."""
        self._poll_gba(block=True)

    def _abort_gba(self, reason: str):
        """`mbStopGBA` role: a newer merge / rebase / splice supersedes the
        in-flight solve — drop it (the device result is discarded)."""
        if self._pending_gba is not None:
            self._pending_gba = None
            self.log.append(("gba_aborted", reason))

    def _apply_frame_change(self, parent_agent_id: int, S):
        """Re-base my map + trajectory into a peer's frame and re-parent the
        frame tree (`receiveChangeCoordinateFrame`, `:951-999`)."""
        self._abort_gba("frame_change")
        self.tracker.exit_autonomous()
        self.tracker.map = merge_mod.transform_map(self.map, S)
        # current pose: T_cw' composes with S^-1 like keyframe poses
        Sc = lie.sim3_mul(lie.sim3_from_se3(self.tracker.last_pose), lie.sim3_inv(S))
        self.tracker.last_pose = lie.se3(
            lie.sim3_q(Sc), lie.sim3_t(Sc) / jnp.maximum(lie.sim3_s(Sc), 1e-12)
        )
        self.tracker.rebase_history(S)
        self.frames.set_parent_frame(parent_agent_id, np.asarray(S))
        # inform my already-merged group (sendChangeCoordinateFrame, :920-948)
        for p in self.peers:
            if p.successfully_merged and p.agent_id != parent_agent_id:
                self.transport.publish(
                    self.agent_id, p.agent_id, msgs.CH_CHANGE_COORDINATE_FRAME,
                    msgs.ChangeCoordinateFrame(
                        self.agent_id, parent_agent_id,
                        msgs.Sim3Transform.from_sim3(np.asarray(S)),
                    ),
                )

    def _receive_change_coordinate_frame(self, m: msgs.ChangeCoordinateFrame):
        S = jnp.asarray(m.transform.as_sim3())
        self._apply_frame_change(m.parent_agent_id, S)
        # implicit merge with the new parent's group (announced, :974-997)
        if m.parent_agent_id in self.peers.peers:
            p = self.peers[m.parent_agent_id]
            if not p.successfully_merged:
                p.successfully_merged = True
                self.transport.publish(
                    self.agent_id, None, msgs.CH_SUCCESSFULLY_MERGED,
                    msgs.SuccessfullyMerged(
                        sender_agent_id=self.agent_id,
                        receiver_agent_id=m.parent_agent_id,
                        successfully_merged=True, implicit_merge=True,
                    ),
                )

    def _receive_successfully_merged(self, m: msgs.SuccessfullyMerged):
        if m.sender_agent_id == self.agent_id:
            return
        if m.successfully_merged:
            self._peer_merges.add(
                frozenset({m.sender_agent_id, m.receiver_agent_id})
            )
        if m.sender_agent_id in self.peers.peers:
            sender = self.peers[m.sender_agent_id]
            if m.receiver_agent_id == self.agent_id and m.successfully_merged:
                # the peer merged our map into theirs: mark merged; their
                # keyframe set is announced so we can seed dedup (:663-682)
                sender.successfully_merged = True
                sender.remote_successfully_merged = True
                mine = {msgs.uuid_key(u)
                        for u in self.meta.kf_uuid[: int(self.map.n_kf)]}
                sender.sent_key_frame_uuids.update(
                    u for u in (tuple(x) for x in m.all_key_frames_in_map)
                    if u in mine
                )
        self._transitive_merge_closure()

    def _transitive_merge_closure(self):
        """Implicit transitive merges (`orb_slam3_wrapper.cpp:684-707`): any
        peer connected to my merged group through announced peer-peer merges
        is merged with me too. Runs to fixpoint over the announcement set."""
        changed = True
        while changed:
            changed = False
            merged = {self.agent_id} | {
                p.agent_id for p in self.peers if p.successfully_merged
            }
            for p in self.peers:
                if p.successfully_merged:
                    continue
                if any(frozenset({p.agent_id, q}) in self._peer_merges
                       for q in merged):
                    p.successfully_merged = True
                    changed = True
                    self._peer_merges.add(frozenset({self.agent_id, p.agent_id}))
                    self.log.append(("implicit_merge", p.agent_id))
                    self.transport.publish(
                        self.agent_id, None, msgs.CH_SUCCESSFULLY_MERGED,
                        msgs.SuccessfullyMerged(
                            sender_agent_id=self.agent_id,
                            receiver_agent_id=p.agent_id,
                            successfully_merged=True, implicit_merge=True,
                        ),
                    )

    def _receive_new_key_frames(self, m: msgs.NewKeyFrames):
        """External keyframe ingestion (`:386-455` + `LocalMapping.cc:302-354`):
        uuid-relinked splice, duplicate fusion, one local BA after the batch."""
        # the splice + its post-batch local BA move snapshot-slot poses: an
        # in-flight GBA result computed pre-splice would overwrite them with
        # stale geometry when it lands (same supersede rule as merge/rebase)
        self._abort_gba("kf_splice")
        self.tracker.exit_autonomous()
        self.tracker.flush_meta()
        packet = codec.MapPacket.from_bytes(m.serialized_map)
        if packet.n_kf == 0:
            return
        mB, metaB = codec.materialize(packet, self.config.frontend.capacity)
        merged, meta, kf_map, pt_map = merge_mod.merge_maps(
            self.map, self.meta, mB, metaB, lie.sim3_identity()
        )
        fc = self.config.frontend
        # weld around the newest external keyframe
        new_slots = [int(kf_map[j]) for j in range(packet.n_kf) if kf_map[j] >= 0]
        if new_slots:
            c = jnp.int32(new_slots[-1])
            merged = local_mapping.fuse_duplicates(
                merged, c, self.tracker.K, n_neighbors=5,
                n_levels=fc.n_levels, scale_factor=fc.scale_factor,
            )
            merged, _ = local_mapping.local_ba(
                merged, c, self.tracker.K, n_local=12, n_fixed=8, n_pts=2048,
                iters=4, n_levels=fc.n_levels, scale_factor=fc.scale_factor,
            )
            merged = map_state.update_point_stats(merged, fc.n_levels, fc.scale_factor)
        self.tracker.map = merged
        self.tracker.meta = meta
        self.tracker.n_kf_host = int(merged.n_kf)
        self.tracker.map_epoch += 1  # slot layout changed: refresh mirrors
        if m.sender_agent_id in self.peers.peers:
            self.peers[m.sender_agent_id].sent_key_frame_uuids.update(
                msgs.uuid_key(u) for u in packet.kf_uuid
            )

    # ------------------------------------------------------------------
    # services
    # ------------------------------------------------------------------

    def _srv_get_current_map(self, caller, req: msgs.GetCurrentMapRequest):
        """`handleGetCurrentMapRequest` (`:150-172`): deep-copied map pruned
        to own-creator keyframes."""
        self.tracker.drain_auto()
        self.tracker.flush_meta()
        own = self._own_kf_slots()
        mask = np.zeros(self.map.kf_capacity, bool)
        mask[own] = True
        packet = codec.extract_submap(self.map, self.meta, mask)
        return msgs.GetCurrentMapResponse(
            self.agent_id, packet.to_bytes(),
            req.merge_candidate_key_frame_uuids,
        )

    def _srv_get_map_points(self, caller, req):
        self.tracker.drain_auto()
        self.tracker.flush_meta()
        n = int(self.map.n_pt)
        valid = np.asarray(self.map.pt_valid[:n])
        return msgs.GetMapPointsResponse(
            uuids=self.meta.pt_uuid[:n][valid],
            positions=np.asarray(self.map.pt_pos[:n])[valid],
        )

    # ------------------------------------------------------------------
    # scale alignment (`updateMapScale`, `:766-833`)
    # ------------------------------------------------------------------

    def _update_map_scale(self, ts):
        self._next_scale_ts = ts + self._scale_interval
        target = self.peers.lowest_merged_peer()
        if target is None or target > self.agent_id:
            return  # align to lower-id (lead-side) peers only
        resp = self.transport.call(self.agent_id, target, msgs.SRV_GET_MAP_POINTS,
                                   msgs.GetMapPointsRequest(self.agent_id))
        if resp is None or len(resp.uuids) == 0:
            return
        # real alignment work ahead — only NOW settle the pipeline (a drain
        # on every timer tick would dispatch partial autonomous batches and
        # stall the loop even for agents with no merged peer)
        self.tracker.drain_auto()
        self.tracker.flush_meta()
        n = int(self.map.n_pt)
        mine_valid = np.asarray(self.map.pt_valid[:n])
        lut = {msgs.uuid_key(u): i for i, u in enumerate(self.meta.pt_uuid[:n])
               if mine_valid[i]}
        src_idx, dst_pos = [], []
        for u, p in zip(resp.uuids, resp.positions):
            i = lut.get(msgs.uuid_key(u))
            if i is not None:
                src_idx.append(i)
                dst_pos.append(p)
        if len(src_idx) < MIN_MAP_POINTS_FOR_SCALE_ADJUSTMENT:
            return
        src = np.asarray(self.map.pt_pos)[np.asarray(src_idx)]
        dst = np.asarray(dst_pos, np.float32)
        self.key, sub = jax.random.split(self.key)
        S, inl, cnt = alignment.ransac_umeyama(
            sub, jnp.asarray(src), jnp.asarray(dst),
            jnp.ones(len(src_idx), bool), num_hypotheses=500,
        )
        s = float(S[7])
        # about to re-base the whole map: leave the autonomous lane so the
        # device continuation is rebuilt from the transformed pose, and
        # drop any in-flight GBA (its snapshot is in the old frame)
        self._abort_gba("scale_realign")
        self.tracker.exit_autonomous()
        self.tracker.map = merge_mod.transform_map(self.map, S)
        Sc = lie.sim3_mul(lie.sim3_from_se3(self.tracker.last_pose), lie.sim3_inv(S))
        self.tracker.last_pose = lie.se3(
            lie.sim3_q(Sc), lie.sim3_t(Sc) / jnp.maximum(lie.sim3_s(Sc), 1e-12)
        )
        self.tracker.rebase_history(S)
        # AIMD backoff around |s-1| < 0.01 (`:804-812`)
        if abs(s - 1.0) < 0.01:
            self._scale_interval = min(self._scale_interval * 2.0, 160.0)
        else:
            self._scale_interval = SCALE_ALIGN_BASE_INTERVAL
        self._next_scale_ts = ts + self._scale_interval
        self.log.append(("scale_aligned", target, s))
