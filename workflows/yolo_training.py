#!/usr/bin/env python
"""Train the worm-head detector (reference: yolo_training.ipynb).

Consumes a YOLO-format dataset (images + ``.txt`` label files with
``class cx cy w h`` normalized rows) and trains the Flax YOLOv8 with the
native TAL/CIoU/DFL loss.  Reference recipe: YOLOv8s, imgsz 384, batch 72,
AdamW, 100 epochs, single class (yolo/yolo_train_config.yaml).
"""

from __future__ import annotations

import argparse
import os


def load_yolo_dataset(images_dir: str, labels_dir: str, imgsz: int, max_gt: int = 4):
    """Load a YOLO-format dataset into padded arrays."""
    import cv2 as cv
    import numpy as np

    names = sorted(f for f in os.listdir(images_dir) if f.lower().endswith((".png", ".jpg", ".bmp")))
    images, gts, clss, masks = [], [], [], []
    for name in names:
        img = cv.imread(os.path.join(images_dir, name), cv.IMREAD_GRAYSCALE)
        h, w = img.shape
        img = cv.resize(img, (imgsz, imgsz))
        images.append(np.repeat(img[..., None], 3, axis=-1).astype(np.float32) / 255.0)

        label_path = os.path.join(labels_dir, os.path.splitext(name)[0] + ".txt")
        gt = np.zeros((max_gt, 4), np.float32)
        cls = np.zeros((max_gt,), np.int32)
        mask = np.zeros((max_gt,), bool)
        if os.path.exists(label_path):
            for j, line in enumerate(open(label_path).read().split("\n")):
                if not line.strip() or j >= max_gt:
                    continue
                c, cx, cy, bw, bh = (float(v) for v in line.split())
                gt[j] = (
                    (cx - bw / 2) * imgsz,
                    (cy - bh / 2) * imgsz,
                    (cx + bw / 2) * imgsz,
                    (cy + bh / 2) * imgsz,
                )
                cls[j] = int(c)
                mask[j] = True
        gts.append(gt)
        clss.append(cls)
        masks.append(mask)
    import numpy as np

    return np.stack(images), np.stack(gts), np.stack(clss), np.stack(masks)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", required=True)
    ap.add_argument("--labels", required=True)
    ap.add_argument("--output", required=True, help="weights output (.npz)")
    ap.add_argument("--scale", default="s", choices=["n", "s", "m"])
    ap.add_argument("--imgsz", type=int, default=384)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch", type=int, default=72)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from wtracker_tpu.models.yolov8 import YoloV8, YoloV8Detector
    from wtracker_tpu.neural.yolo_training import YoloTrainer

    images, gt, cls, mask = load_yolo_dataset(args.images, args.labels, args.imgsz)
    print(f"{len(images)} images, {int(mask.sum())} boxes")

    model = YoloV8(nc=int(cls.max()) + 1, scale=args.scale)
    variables = model.init(
        jax.random.PRNGKey(args.seed), jnp.zeros((1, args.imgsz, args.imgsz, 3), jnp.float32), train=False
    )
    trainer = YoloTrainer(model, variables, imgsz=(args.imgsz, args.imgsz), learning_rate=args.lr)

    rng = np.random.default_rng(args.seed)
    n = len(images)
    bs = min(args.batch, n)
    for epoch in range(args.epochs):
        perm = rng.permutation(n)
        losses = []
        for s in range(0, n - bs + 1, bs):
            idx = perm[s : s + bs]
            loss, parts = trainer.step(images[idx], gt[idx], cls[idx], mask[idx])
            losses.append(loss)
        if epoch % 5 == 0 or epoch == args.epochs - 1:
            print(f"epoch {epoch}: loss {np.mean(losses):.4f}")

    det = YoloV8Detector(model, trainer.trained_variables, imgsz=(args.imgsz, args.imgsz))
    det.save(args.output)
    print(f"weights saved to {args.output}")


if __name__ == "__main__":
    main()
