"""The mtcars dataset (Henderson & Velleman 1981; R `datasets::mtcars`),
embedded as a test fixture.  Public-domain data; 32 rows × 11 columns.

Used by the golden-value parity tests mirroring the reference's
``tests/testthat/test_basic_usage.R`` — the expected Toyota Corolla kernel
row there (tolerance 0.01) cross-checks this embedding digit by digit.
"""
import numpy as np

ROWNAMES = [
    "Mazda RX4", "Mazda RX4 Wag", "Datsun 710", "Hornet 4 Drive",
    "Hornet Sportabout", "Valiant", "Duster 360", "Merc 240D", "Merc 230",
    "Merc 280", "Merc 280C", "Merc 450SE", "Merc 450SL", "Merc 450SLC",
    "Cadillac Fleetwood", "Lincoln Continental", "Chrysler Imperial",
    "Fiat 128", "Honda Civic", "Toyota Corolla", "Toyota Corona",
    "Dodge Challenger", "AMC Javelin", "Camaro Z28", "Pontiac Firebird",
    "Fiat X1-9", "Porsche 914-2", "Lotus Europa", "Ford Pantera L",
    "Ferrari Dino", "Maserati Bora", "Volvo 142E",
]

COLNAMES = ["mpg", "cyl", "disp", "hp", "drat", "wt", "qsec", "vs", "am",
            "gear", "carb"]

MTCARS = np.array([
    [21.0, 6, 160.0, 110, 3.90, 2.620, 16.46, 0, 1, 4, 4],
    [21.0, 6, 160.0, 110, 3.90, 2.875, 17.02, 0, 1, 4, 4],
    [22.8, 4, 108.0,  93, 3.85, 2.320, 18.61, 1, 1, 4, 1],
    [21.4, 6, 258.0, 110, 3.08, 3.215, 19.44, 1, 0, 3, 1],
    [18.7, 8, 360.0, 175, 3.15, 3.440, 17.02, 0, 0, 3, 2],
    [18.1, 6, 225.0, 105, 2.76, 3.460, 20.22, 1, 0, 3, 1],
    [14.3, 8, 360.0, 245, 3.21, 3.570, 15.84, 0, 0, 3, 4],
    [24.4, 4, 146.7,  62, 3.69, 3.190, 20.00, 1, 0, 4, 2],
    [22.8, 4, 140.8,  95, 3.92, 3.150, 22.90, 1, 0, 4, 2],
    [19.2, 6, 167.6, 123, 3.92, 3.440, 18.30, 1, 0, 4, 4],
    [17.8, 6, 167.6, 123, 3.92, 3.440, 18.90, 1, 0, 4, 4],
    [16.4, 8, 275.8, 180, 3.07, 4.070, 17.40, 0, 0, 3, 3],
    [17.3, 8, 275.8, 180, 3.07, 3.730, 17.60, 0, 0, 3, 3],
    [15.2, 8, 275.8, 180, 3.07, 3.780, 18.00, 0, 0, 3, 3],
    [10.4, 8, 472.0, 205, 2.93, 5.250, 17.98, 0, 0, 3, 4],
    [10.4, 8, 460.0, 215, 3.00, 5.424, 17.82, 0, 0, 3, 4],
    [14.7, 8, 440.0, 230, 3.23, 5.345, 17.42, 0, 0, 3, 4],
    [32.4, 4,  78.7,  66, 4.08, 2.200, 19.47, 1, 1, 4, 1],
    [30.4, 4,  75.7,  52, 4.93, 1.615, 18.52, 1, 1, 4, 2],
    [33.9, 4,  71.1,  65, 4.22, 1.835, 19.90, 1, 1, 4, 1],
    [21.5, 4, 120.1,  97, 3.70, 2.465, 20.01, 1, 0, 3, 1],
    [15.5, 8, 318.0, 150, 2.76, 3.520, 16.87, 0, 0, 3, 2],
    [15.2, 8, 304.0, 150, 3.15, 3.435, 17.30, 0, 0, 3, 2],
    [13.3, 8, 350.0, 245, 3.73, 3.840, 15.41, 0, 0, 3, 4],
    [19.2, 8, 400.0, 175, 3.08, 3.845, 17.05, 0, 0, 3, 2],
    [27.3, 4,  79.0,  66, 4.08, 1.935, 18.90, 1, 1, 4, 1],
    [26.0, 4, 120.3,  91, 4.43, 2.140, 16.70, 0, 1, 5, 2],
    [30.4, 4,  95.1, 113, 3.77, 1.513, 16.90, 1, 1, 5, 2],
    [15.8, 8, 351.0, 264, 4.22, 3.170, 14.50, 0, 1, 5, 4],
    [19.7, 6, 145.0, 175, 3.62, 2.770, 15.50, 0, 1, 5, 6],
    [15.0, 8, 301.0, 335, 3.54, 3.570, 14.60, 0, 1, 5, 8],
    [21.4, 4, 121.0, 109, 4.11, 2.780, 18.60, 1, 1, 4, 2],
], dtype=np.float64)


def mtcars_xy():
    """y = mpg, X = all other columns — the reference test's setup
    (``tests/testthat/test_basic_usage.R:5-7``)."""
    y = MTCARS[:, 0].copy()
    X = MTCARS[:, 1:].copy()
    return y, X, COLNAMES[1:]


# Expected Toyota Corolla kernel row from the reference's golden test
# (``tests/testthat/test_basic_usage.R:65-96``), keyed by alphabetized row
# name there; re-ordered here to the natural mtcars row order.
_COROLLA_GOLDEN_ALPHA = {
    "AMC Javelin": 0.0547298949171582,
    "Cadillac Fleetwood": 0.00549165470976291,
    "Camaro Z28": 0.0156630175526991,
    "Chrysler Imperial": 0.0060180975553816,
    "Datsun 710": 0.860610665218997,
    "Dodge Challenger": 0.033400030235352,
    "Duster 360": 0.0143264812794483,
    "Ferrari Dino": 0.062192422562695,
    "Fiat 128": 0.973400786036153,
    "Fiat X1-9": 0.961130622208994,
    "Ford Pantera L": 0.0207382308766512,
    "Honda Civic": 0.753451355337079,
    "Hornet 4 Drive": 0.19371687432462,
    "Hornet Sportabout": 0.0388127837578353,
    "Lincoln Continental": 0.00503976771060228,
    "Lotus Europa": 0.528183252015446,
    "Maserati Bora": 0.00201340749064979,
    "Mazda RX4": 0.239466325088983,
    "Mazda RX4 Wag": 0.254841103009284,
    "Merc 230": 0.373560094613131,
    "Merc 240D": 0.464081081884477,
    "Merc 280": 0.250345020593959,
    "Merc 280C": 0.262879139614823,
    "Merc 450SE": 0.0344532182858226,
    "Merc 450SL": 0.0411135560575867,
    "Merc 450SLC": 0.0424741434773812,
    "Pontiac Firebird": 0.0270102739090449,
    "Porsche 914-2": 0.3709635022494,
    "Toyota Corolla": 1.0,
    "Toyota Corona": 0.468060548244946,
    "Valiant": 0.146078393891752,
    "Volvo 142E": 0.78179636900690,
}

COROLLA_KERNEL_GOLDEN = np.array(
    [_COROLLA_GOLDEN_ALPHA[name] for name in ROWNAMES])

COROLLA_INDEX = ROWNAMES.index("Toyota Corolla")
