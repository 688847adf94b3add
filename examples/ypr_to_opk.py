"""YPR -> OPK photogrammetry prep: runnable port of the reference
notebook "ypr_to_opk_example.ipynb".

Reads geotagged photos into a DataFrame, derives each exposure's yaw
from the flight track, converts yaw/pitch/roll to the omega/phi/kappa
convention photogrammetry packages expect, and writes the CSV.  The
notebook's POAS/*.jpg images aren't shipped, so the port generates a
small geotagged flight line with PIL (same EXIF layout the reference
reads via piexif).

    python examples/ypr_to_opk.py
"""

import glob
import os
import sys

import numpy as np

for _p in (os.path.dirname(os.path.abspath(__file__)),
           os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")):
    if _p not in sys.path:
        sys.path.insert(0, _p)
import neilpy_tpu as nt
from _common import out


def write_photo(path, hms, lat_dd, lon_dd, alt_m):
    """A minimal geotagged JPEG (the reference reads these tags via
    piexif; ours via PIL — same EXIF GPS IFD layout)."""
    from PIL import Image, ExifTags
    from PIL.TiffImagePlugin import IFDRational

    def dms(v):
        v = abs(v)
        d = int(v)
        m = int((v - d) * 60)
        s = (v - d - m / 60) * 3600
        return (IFDRational(d), IFDRational(m),
                IFDRational(int(round(s * 1e4)), 10**4))

    h, m, s = hms
    im = Image.new("RGB", (8, 8), (40, 60, 80))
    exif = Image.Exif()
    exif[ExifTags.IFD.GPSInfo] = {
        1: "N" if lat_dd >= 0 else "S", 2: dms(lat_dd),
        3: "E" if lon_dd >= 0 else "W", 4: dms(lon_dd),
        5: 0, 6: IFDRational(int(round(alt_m * 10)), 10),
        7: (IFDRational(h), IFDRational(m), IFDRational(s)),
        29: "2023:06:01",
    }
    exif[ExifTags.IFD.Exif] = {
        36867: f"2023:06:01 {h:02d}:{m:02d}:{s:02d}"}
    im.save(path, exif=exif)


# a north-east flight line of 6 exposures, 1 s apart
photo_dir = out("poas")
os.makedirs(photo_dir, exist_ok=True)
for t in range(6):
    write_photo(os.path.join(photo_dir, f"POAS_{t:03d}.jpg"),
                (12, 0, t), 40.0 + 1e-4 * t, -105.0 + 1e-4 * t,
                1200.0 + t)

# ----------------------------------------------------------------------
# the notebook flow, step for step
# ----------------------------------------------------------------------
fns = sorted(glob.glob(os.path.join(photo_dir, "*.jpg")))
photos_df = nt.read_geotags_into_df(fns)
photos_df["fn"] = photos_df["fn"].apply(os.path.basename)

photos_df["azimuth"] = nt.track2azimuth(photos_df["lat"].values,
                                        photos_df["lon"].values)
# yaw = track azimuth; nadir-ish camera: pitch -85, roll 0 (the
# reference's ypr2opk supports only roll == 0)
omega, phi, kappa = nt.ypr2opk(photos_df["azimuth"].values, -85.0)
photos_df["omega"] = omega
photos_df["phi"] = phi
photos_df["kappa"] = kappa

csv = out("poas_opk.csv")
photos_df.to_csv(csv, index=False)
print(photos_df[["fn", "lat", "lon", "azimuth", "omega", "phi",
                 "kappa"]].to_string(index=False))
print("wrote", csv)

# oracles: a NE line at lat 40 — spherical flat-earth estimate
# atan2(dlon*cos(lat), dlat) ~ 37.46 deg; track2azimuth is geodesic
# (WGS84), which lands ~0.1 deg away
az_expect = np.degrees(np.arctan2(np.cos(np.radians(40.0)), 1.0))
az = photos_df["azimuth"].values
assert np.allclose(az, az_expect, atol=0.3)
assert np.ptp(az) < 0.01                     # straight line
# reference convention: kappa = -yaw
assert np.allclose(photos_df["kappa"].values, -az, atol=1e-9)
# pitch -85 -> omega = 90 + pitch = 5 at azimuth 0; at azimuth ~37 deg
# omega/phi split the 5-deg off-nadir tilt: |(omega, phi)| ~ 5
assert np.allclose(np.hypot(photos_df["omega"], photos_df["phi"]),
                   5.0, atol=0.1)

print("ypr to opk complete")
