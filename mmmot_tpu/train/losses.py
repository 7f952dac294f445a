"""Tracking losses — rebuild of the reference criterion (SURVEY.md §2.12).

The reference trains the joint association decision with cross-entropy: for
every prev detection, a softmax over {link to each curr det, end}; for every
curr detection, {linked-from each prev det, new}; plus binary terms on the
new/end indicators and an optional detection-confidence term.  All terms here
are masked for padded slots and normalised by true detection counts.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from mmmot_tpu.ops.masking import masked_log_softmax, pair_mask


def _prev_ce(link, end, gt_link, gt_end, sup_prev, mask_curr):
    """CE over each prev det's decision: [link to j..., end].

    ``sup_prev`` selects which prev dets carry supervision (real dets);
    ``mask_curr`` is the full candidate set (so links toward false
    positives are suppressed through the softmax denominators).
    """
    logits = jnp.concatenate([link, end[..., :, None]], axis=-1)
    cand_mask = jnp.concatenate(
        [pair_mask(sup_prev, mask_curr),
         sup_prev[..., :, None]], axis=-1)
    logp = masked_log_softmax(logits, cand_mask, axis=-1)
    target = jnp.concatenate([gt_link, gt_end[..., :, None]], axis=-1)
    ce = -jnp.sum(target * jnp.where(cand_mask, logp, 0.0), axis=-1)
    cnt = jnp.maximum(jnp.sum(sup_prev), 1)
    return jnp.sum(ce * sup_prev) / cnt


def _curr_ce(link, new, gt_link, gt_new, sup_curr, mask_prev):
    """CE over each curr det's decision: [linked-from i..., new]."""
    linkT = jnp.swapaxes(link, -1, -2)
    gt_linkT = jnp.swapaxes(gt_link, -1, -2)
    logits = jnp.concatenate([linkT, new[..., :, None]], axis=-1)
    cand_mask = jnp.concatenate(
        [pair_mask(sup_curr, mask_prev),
         sup_curr[..., :, None]], axis=-1)
    logp = masked_log_softmax(logits, cand_mask, axis=-1)
    target = jnp.concatenate([gt_linkT, gt_new[..., :, None]], axis=-1)
    ce = -jnp.sum(target * jnp.where(cand_mask, logp, 0.0), axis=-1)
    cnt = jnp.maximum(jnp.sum(sup_curr), 1)
    return jnp.sum(ce * sup_curr) / cnt


def _masked_bce(logits, targets, mask):
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1)


def tracking_loss(outputs: Dict[str, jnp.ndarray],
                  batch: Dict[str, jnp.ndarray],
                  weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
                  ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total loss + per-term metrics.

    outputs: net forward dict (link [B,T-1,N,N], new/end [B,T-1,N],
    det [B,T,N]); batch carries gt_link/gt_new/gt_end (same pair shapes),
    det_mask [B,T,N] and gt_ids [B,T,N] (for the det-confidence target:
    id >= 0 means a true detection, -1 a false positive).
    """
    w_link, w_new, w_end, w_det = weights
    # Compact-first training may drop overflow detections; kept_mask from
    # the forward then masks them out of the loss consistently.
    det_mask = outputs.get("kept_mask", batch["det_mask"])
    # False positives (gt_id < 0) are EXCLUDED from association
    # supervision: under the y_det ILP their correct decision is
    # *rejection* — an arm that exists in the LP, not in the {link..., new}
    # softmax — so labelling them "new"/"end" would train the birth/death
    # heads to legitimise clutter and veto LP rejection.  Their supervision
    # is the det-confidence BCE below (target 0).  Candidate columns still
    # include them (real rows learn NOT to link to clutter); only their own
    # CE/BCE rows drop out.
    sup_mask = det_mask
    if "gt_ids" in batch:
        sup_mask = det_mask & (batch["gt_ids"] >= 0)
    sup_prev, sup_curr = sup_mask[:, :-1], sup_mask[:, 1:]
    mask_prev, mask_curr = det_mask[:, :-1], det_mask[:, 1:]

    link = outputs["link"]
    ce_prev = _prev_ce(link, outputs["end"], batch["gt_link"],
                       batch["gt_end"], sup_prev, mask_curr)
    ce_curr = _curr_ce(link, outputs["new"], batch["gt_link"],
                       batch["gt_new"], sup_curr, mask_prev)
    bce_new = _masked_bce(outputs["new"], batch["gt_new"], sup_curr)
    bce_end = _masked_bce(outputs["end"], batch["gt_end"], sup_prev)

    # FP-involving pairs get explicit link suppression: with FP rows out
    # of the CE, an FP<->FP pair would otherwise be entirely unsupervised
    # and the link head free to chain clutter across frames (measured: it
    # does).  Real->FP pairs are doubly covered (CE columns + this).
    bce_fp_link = 0.0
    if "gt_ids" in batch:
        vp = pair_mask(mask_prev, mask_curr)
        rp = pair_mask(sup_prev, sup_curr)
        fp_pair = vp & ~rp
        bce_fp_link = _masked_bce(link, jnp.zeros_like(link), fp_pair)

    metrics = {"ce_prev": ce_prev, "ce_curr": ce_curr,
               "bce_new": bce_new, "bce_end": bce_end,
               "bce_fp_link": bce_fp_link,
               # Observability: with compact-first training this is the
               # KEPT count — watch it against the batch's true valid
               # count to catch capacity overflow.
               "n_dets": jnp.sum(det_mask.astype(jnp.float32))}
    total = (w_link * (ce_prev + ce_curr + bce_fp_link)
             + w_new * bce_new + w_end * bce_end)

    if "det" in outputs and "gt_ids" in batch:
        det_target = (batch["gt_ids"] >= 0).astype(jnp.float32)
        bce_det = _masked_bce(outputs["det"], det_target, det_mask)
        metrics["bce_det"] = bce_det
        total = total + w_det * bce_det

    metrics["total"] = total
    return total, metrics
