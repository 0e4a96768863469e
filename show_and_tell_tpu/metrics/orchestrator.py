"""Metric orchestrator — the ``COCOEvalCap`` equivalent.

Same pipeline as the reference (pycocoevalcap/eval.py:9-75): pair ground
truths and results per image id, PTB-tokenize both sides, run the scorer
suite, and aggregate corpus-level scores (``.eval``) plus per-image scores
(``.imgToEval`` / ``.evalImgs``) under the identical metric names
(Bleu_1..Bleu_4, METEOR, ROUGE_L, CIDEr, SPICE — eval.py:39-45).

SPICE runs only when a backend is installed (metrics/spice.py), mirroring
the reference's de-facto behavior where the SPICE jar is missing.
"""

from __future__ import annotations

import logging
from typing import Dict

from show_and_tell_tpu.metrics.bleu import Bleu
from show_and_tell_tpu.metrics.cider import Cider
from show_and_tell_tpu.metrics.meteor import Meteor
from show_and_tell_tpu.metrics.rouge import Rouge
from show_and_tell_tpu.metrics.spice import Spice
from show_and_tell_tpu.metrics.tokenizer import PTBTokenizer

log = logging.getLogger(__name__)


class COCOEvalCap:
    def __init__(self, coco, cocoRes):
        self.evalImgs = []
        self.eval: Dict[str, float] = {}
        self.imgToEval: Dict = {}
        self.coco = coco
        self.cocoRes = cocoRes
        self.params = {"image_id": coco.getImgIds()}

    def evaluate(self) -> Dict[str, float]:
        imgIds = self.params["image_id"]
        gts = {i: self.coco.imgToAnns[i] for i in imgIds}
        res = {i: self.cocoRes.imgToAnns[i] for i in imgIds}

        log.info("tokenization...")
        tokenizer = PTBTokenizer()
        gts = tokenizer.tokenize(gts)
        res = tokenizer.tokenize(res)

        scorers = [
            (Bleu(4), ["Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4"]),
            (Meteor(), "METEOR"),
            (Rouge(), "ROUGE_L"),
            (Cider(), "CIDEr"),
        ]
        spice = Spice(strict=False)
        if spice.available():
            scorers.append((spice, "SPICE"))

        for scorer, method in scorers:
            log.info("computing %s score...", scorer.method())
            score, scores = scorer.compute_score(gts, res)
            if isinstance(method, list):
                for sc, scs, m in zip(score, scores, method):
                    self.setEval(sc, m)
                    self.setImgToEvalImgs(scs, list(gts.keys()), m)
                    log.info("%s: %0.3f", m, sc)
            else:
                self.setEval(score, method)
                self.setImgToEvalImgs(scores, list(gts.keys()), method)
                log.info("%s: %0.3f", method, score)
        self.setEvalImgs()
        return self.eval

    def setEval(self, score, method):
        self.eval[method] = score

    def setImgToEvalImgs(self, scores, imgIds, method):
        for imgId, score in zip(sorted(imgIds), scores):
            self.imgToEval.setdefault(imgId, {"image_id": imgId})[method] = score

    def setEvalImgs(self):
        self.evalImgs = [self.imgToEval[i] for i in sorted(self.imgToEval.keys())]
