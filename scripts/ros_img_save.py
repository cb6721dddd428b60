"""Subscribe to a ROS RGB image topic and save frames to disk.

Parity: /root/reference/scripts/ros_img_save.py (rospy + cv_bridge +
cv2.imwrite).  This version decodes sensor_msgs/Image directly from the
raw buffer (no cv_bridge dependency — the image message is a documented
height x width x channels byte layout) and writes PNGs with imageio or a
minimal PPM fallback, so it runs in the ROS-less test image too (rospy is
import-gated exactly like mrcc_tpu/app/freenect.py).

  python scripts/ros_img_save.py --topic /camera/rgb/image_color --out ./
"""

import argparse
import os
import sys
import time

import numpy as np


def image_msg_to_array(msg):
    """sensor_msgs/Image -> HxWx3 uint8 RGB (handles bgr8/rgb8)."""
    arr = np.frombuffer(msg.data, np.uint8).reshape(msg.height, -1)
    arr = arr[:, :msg.width * 3].reshape(msg.height, msg.width, 3)
    enc = getattr(msg, "encoding", "rgb8").lower()
    if enc.startswith("bgr"):
        arr = arr[..., ::-1]
    return np.ascontiguousarray(arr)


def save_image(arr, path):
    try:
        import imageio.v3 as iio

        iio.imwrite(path, arr)
    except ImportError:
        root, _ = os.path.splitext(path)
        with open(root + ".ppm", "wb") as fp:  # minimal no-deps fallback
            fp.write(b"P6\n%d %d\n255\n" % (arr.shape[1], arr.shape[0]))
            fp.write(arr.astype(np.uint8).tobytes())


def main():
    ap = argparse.ArgumentParser(description="Save ROS camera frames")
    ap.add_argument("--topic", default="/camera/rgb/image_color")
    ap.add_argument("--out", default=".")
    ap.add_argument("--every", type=float, default=0.0,
                    help="min seconds between saves (0 = every frame)")
    args = ap.parse_args()

    try:
        import rospy
        from sensor_msgs.msg import Image
    except ImportError:
        print("rospy is not available in this environment; "
              "image_msg_to_array()/save_image() are importable for tests",
              file=sys.stderr)
        return 1

    os.makedirs(args.out, exist_ok=True)
    state = {"last": 0.0, "count": 0}

    def callback(msg):
        now = time.time()
        if now - state["last"] < args.every:
            return
        state["last"] = now
        arr = image_msg_to_array(msg)
        path = os.path.join(args.out, f"camera_image_{state['count']:06d}.png")
        save_image(arr, path)
        state["count"] += 1
        print("saved", path)

    rospy.init_node("image_listener")
    rospy.Subscriber(args.topic, Image, callback)
    rospy.spin()
    return 0


if __name__ == "__main__":
    sys.exit(main())
