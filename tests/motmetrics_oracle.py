"""Independent transcription of py-motmetrics' algorithm, used as the
canonical oracle for eval/mot.py (the package itself is not installed in
this environment, so canonical behavior is reproduced from its published
algorithm: MOTAccumulator event semantics + the metrics module's
formulas - Bernardin & Stiefelhagen CLEAR-MOT, Ristani et al. ID measures).

Deliberately structured differently from trackmpnn_tpu/eval/mot.py: this
oracle is EVENT-LOG based (it records the full per-frame event stream like
the pandas DataFrame in py-motmetrics, then derives every metric from the
log), while the production code keeps online counters.  Agreement on
randomized streams (tests/test_metrics_oracle.py) is then meaningful.

py-motmetrics behaviors reproduced (motmetrics/mot.py, metrics.py):
  * update step 1: re-establish the LAST KNOWN (gt -> hyp) correspondence
    - persisting across frames where either was absent - when both are
    present and the distance is finite, in gt order, each hyp at most once;
  * update step 2: Hungarian over the remaining finite-distance pairs;
  * events: MATCH / SWITCH (hyp differs from gt's last known hyp) / MISS /
    FP; distances recorded for MATCH+SWITCH;
  * FRAG: per gt, within [first, last] non-MISS frame of its event rows,
    the count of tracked -> not-tracked transitions;
  * MT/PT/ML on matched-frame ratio >= 0.8 / >= 0.2 / else;
  * ID measures via the (nG+nH) x (nH+nG) global assignment with dummy
    rows/cols costing the full trajectory length.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment


class OracleAccumulator:
    def __init__(self):
        self.events = []  # (frame, type, oid, hid, dist)
        self.m = {}       # gt -> last known hyp (never forgotten)
        self.frame = 0

    def update(self, oids, hids, dists):
        oids = [int(o) for o in oids]
        hids = [int(h) for h in hids]
        dists = np.asarray(dists, dtype=float)
        t = self.frame
        self.frame += 1
        matched_o, matched_h = set(), set()

        # step 1: re-establish last known correspondences
        for i, o in enumerate(oids):
            if o not in self.m:
                continue
            hprev = self.m[o]
            for j, h in enumerate(hids):
                if h != hprev or h in matched_h:
                    continue
                if dists.size and np.isfinite(dists[i, j]):
                    self.events.append((t, "MATCH", o, h, float(dists[i, j])))
                    matched_o.add(o)
                    matched_h.add(h)
                break

        # step 2: Hungarian on the rest.  Forbidden edges get a FINITE
        # data-derived cost (py-motmetrics lap.add_expensive_edges): an
        # astronomic constant would absorb the valid costs in float64 and
        # create spurious ties between optimal assignments.
        rem_i = [i for i, o in enumerate(oids) if o not in matched_o]
        rem_j = [j for j, h in enumerate(hids) if h not in matched_h]
        if rem_i and rem_j:
            finite = [dists[i, j] for i in rem_i for j in rem_j
                      if np.isfinite(dists[i, j])]
            INF = (1.0 + max(np.abs(finite), default=0.0)) * (
                len(rem_i) + len(rem_j) + 1)
            C = np.full((len(rem_i), len(rem_j)), INF)
            for a, i in enumerate(rem_i):
                for b, j in enumerate(rem_j):
                    if np.isfinite(dists[i, j]):
                        C[a, b] = dists[i, j]
            for a, b in zip(*linear_sum_assignment(C)):
                if C[a, b] >= INF:
                    continue
                o, h = oids[rem_i[a]], hids[rem_j[b]]
                kind = "SWITCH" if (o in self.m and self.m[o] != h) else "MATCH"
                self.events.append((t, kind, o, h, float(C[a, b])))
                self.m[o] = h
                matched_o.add(o)
                matched_h.add(h)

        for o in oids:
            if o not in matched_o:
                self.events.append((t, "MISS", o, None, np.nan))
        for h in hids:
            if h not in matched_h:
                self.events.append((t, "FP", None, h, np.nan))

        # valid-pair log for the ID measures (gate only, like 'raw' events)
        for i, o in enumerate(oids):
            for j, h in enumerate(hids):
                if dists.size and np.isfinite(dists[i, j]):
                    self.events.append((t, "RAWPAIR", o, h, 0.0))


def _tracked_flags(events, oid):
    """Per frame where `oid` appears: (frame, tracked?) in frame order."""
    out = []
    for (t, kind, o, h, d) in events:
        if o == oid and kind in ("MATCH", "SWITCH", "MISS"):
            out.append((t, kind != "MISS"))
    return out


def oracle_summarize(accs):
    num_gt = fp = miss = switches = matches = 0
    dist_sum = 0.0
    frag = 0
    mt = pt = ml = 0
    uniq = 0
    idtp_total = total_gt_frames = total_hyp_frames = 0

    for acc in accs:
        ev = acc.events
        gt_frames, hyp_frames = {}, {}
        overlap = {}
        for (t, kind, o, h, d) in ev:
            if kind in ("MATCH", "SWITCH", "MISS"):
                gt_frames[o] = gt_frames.get(o, 0) + 1
            if kind in ("MATCH", "SWITCH", "FP"):
                hyp_frames[h] = hyp_frames.get(h, 0) + 1
            if kind in ("MATCH", "SWITCH"):
                matches += kind == "MATCH"
                switches += kind == "SWITCH"
                dist_sum += d
            elif kind == "MISS":
                miss += 1
            elif kind == "FP":
                fp += 1
            elif kind == "RAWPAIR":
                overlap[(o, h)] = overlap.get((o, h), 0) + 1
        num_gt += sum(gt_frames.values())

        # FRAG + MT/PT/ML from the per-object event rows
        for o, nf in gt_frames.items():
            uniq += 1
            flags = _tracked_flags(ev, o)
            tracked = [f for (_, f) in flags]
            n_tracked = sum(tracked)
            ratio = n_tracked / nf
            if ratio >= 0.8:
                mt += 1
            elif ratio >= 0.2:
                pt += 1
            else:
                ml += 1
            if n_tracked:
                first = tracked.index(True)
                last = len(tracked) - 1 - tracked[::-1].index(True)
                span = tracked[first : last + 1]
                frag += sum(1 for a, b in zip(span, span[1:]) if a and not b)

        # ID measures: square assignment with dummy rows/cols
        gts, hyps = sorted(gt_frames), sorted(hyp_frames)
        nG, nH = len(gts), len(hyps)
        total_gt_frames += sum(gt_frames.values())
        total_hyp_frames += sum(hyp_frames.values())
        if nG and nH:
            # finite forbidden cost (see step-2 note): larger than any
            # feasible assignment total, small enough to keep precision
            INF = float(sum(gt_frames.values()) + sum(hyp_frames.values()) + 1) * (nG + nH + 1)
            n = nG + nH
            C = np.zeros((n, n))
            for i, o in enumerate(gts):
                for j, h in enumerate(hyps):
                    ov = overlap.get((o, h), 0)
                    C[i, j] = (gt_frames[o] - ov) + (hyp_frames[h] - ov)
            # gt i unmatched -> all its frames are IDFN
            C[:nG, nH:] = INF
            for i, o in enumerate(gts):
                C[i, nH + i] = gt_frames[o]
            # hyp j unmatched -> all its frames are IDFP
            C[nG:, :nH] = INF
            for j, h in enumerate(hyps):
                C[nG + j, j] = hyp_frames[h]
            rows, cols = linear_sum_assignment(C)
            for i, j in zip(rows, cols):
                if i < nG and j < nH:
                    idtp_total += overlap.get((gts[i], hyps[j]), 0)

    num_det = matches + switches
    idfp = total_hyp_frames - idtp_total
    idfn = total_gt_frames - idtp_total
    return {
        "mota": 1.0 - (miss + fp + switches) / max(num_gt, 1),
        "motp": dist_sum / max(num_det, 1),
        "idf1": 2 * idtp_total / max(2 * idtp_total + idfp + idfn, 1),
        "idp": idtp_total / max(total_hyp_frames, 1),
        "idr": idtp_total / max(total_gt_frames, 1),
        "recall": num_det / max(num_gt, 1),
        "precision": num_det / max(num_det + fp, 1),
        "num_unique_objects": uniq,
        "mostly_tracked": mt,
        "partially_tracked": pt,
        "mostly_lost": ml,
        "num_false_positives": fp,
        "num_misses": miss,
        "num_switches": switches,
        "num_fragmentations": frag,
    }
