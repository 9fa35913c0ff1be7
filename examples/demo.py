"""Demo walkthrough — the reference's AgeGenderIdentityDemo.ipynb flow.

Detect faces on the sample photo, predict age/gender/identity per face, draw
annotations, then show that identity embeddings from the same photo separate
people (pairwise distances).

Run from the repo root:  python examples/demo.py [image.jpg]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np

from hse_facerec_tf_tpu.models import zoo
from hse_facerec_tf_tpu.ops.distance import pairwise_euclidean, l2_normalize
from hse_facerec_tf_tpu.pipelines.analyzer import FacialAnalyzer
from hse_facerec_tf_tpu.utils.draw import draw_faces
from hse_facerec_tf_tpu.utils.image_io import imread_rgb


def main():
    image_path = sys.argv[1] if len(sys.argv) > 1 else (
        zoo.REFERENCE_ROOT + "/age_gender_identity/test_image.jpg")
    img = imread_rgb(image_path)
    h, w = img.shape[:2]
    scale = min(640 / w, 480 / h, 1.0)
    if scale < 1.0:
        img = cv2.resize(img, (int(w * scale), int(h * scale)))

    print("loading models (first run compiles)...")
    analyzer = FacialAnalyzer.from_reference_models(zoo.MTCNN_PB, zoo.AGEGENDER_PB)
    faces = analyzer.analyze(img)

    print(f"\n{len(faces)} faces:")
    for i, f in enumerate(faces):
        gender = "male" if f.is_male() else "female"
        print(f"  face {i}: bbox={f.bbox} age={f.age:.1f} {gender} "
              f"(p_male={f.gender_prob:.2f}, det score={f.score:.3f})")

    if len(faces) > 1:
        feats = l2_normalize(np.stack([f.identity for f in faces]))
        d = np.asarray(pairwise_euclidean(feats, feats))
        print("\npairwise identity distances (same person would be < ~0.8):")
        with np.printoptions(precision=2, suppress=True):
            print(d)

    out_path = "demo_annotated.jpg"
    cv2.imwrite(out_path, cv2.cvtColor(draw_faces(img, faces), cv2.COLOR_RGB2BGR))
    print(f"\nannotated image -> {out_path}")


if __name__ == "__main__":
    main()
