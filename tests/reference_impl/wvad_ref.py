"""Literal float NumPy oracle of the WebRTC VAD algorithm, transcribed from
the reference float port (``/root/reference/third/pywvad/wvad.py``) for
parity-testing the framework's C++ and JAX implementations."""

import numpy as np

C0 = 20972.0 / 32768.0  # upper allpass
C1 = 5571.0 / 32768.0  # lower allpass
HPZ = np.array([6631, -13262, 6631]) / 16384.0
HPP = np.array([16384, -7756, 5620]) / 16384.0
OFFSETS = np.array([368, 368, 272, 176, 176, 176]) / 16.0
MIN_ENERGY = 10.0
SPECTRUM_WEIGHT = np.array([6, 8, 10, 12, 14, 16], float)
NOISE_UPDATE = 655.0 / 2**15
SPEECH_UPDATE = 6554.0 / 2**15
BACK_ETA = 154.0 / 2**8
MIN_DIFF = np.array([544, 544, 576, 576, 576, 576], float) / 2**5
MIN_MEAN = np.array([640, 768], float) / 2**7
MAX_NOISE = np.array([9216, 9088, 8960, 8832, 8704, 8576], float) / 2**7
MAX_SPEECH = np.array([11392, 11392, 11520, 11520, 11520, 11520], float) / 2**7
NOISE_W = np.array([34, 62, 72, 66, 53, 25, 94, 66, 56, 62, 75, 103], float).reshape(2, 6) / 2**7
SPEECH_W = np.array([48, 82, 45, 87, 50, 47, 80, 46, 83, 41, 78, 81], float).reshape(2, 6) / 2**7
NOISE_MEANS0 = np.array([6738, 4892, 7065, 6715, 6771, 3369, 7646, 3863, 7820, 7266, 5020, 4362], float).reshape(2, 6) / 2**7
SPEECH_MEANS0 = np.array([8306, 10085, 10078, 11823, 11843, 6309, 9473, 9571, 10879, 7581, 8180, 7483], float).reshape(2, 6) / 2**7
NOISE_STDS0 = np.array([378, 1064, 493, 582, 688, 593, 474, 697, 475, 688, 421, 455], float).reshape(2, 6) / 2**7
SPEECH_STDS0 = np.array([555, 505, 567, 524, 585, 1231, 509, 828, 492, 1540, 1079, 850], float).reshape(2, 6) / 2**7
MIN_STD = 384.0 / 2**7
MAX_SPEECH_FRAMES = 6
SMOOTH_DOWN = 6553.0 / 2**15
SMOOTH_UP = 32439.0 / 2**15
COMP_VAR = 22005.0 / 2**10

MODES = {0: (8, 14, 24, 57), 1: (8, 14, 37, 100), 2: (6, 9, 82, 285), 3: (6, 9, 94, 1100)}


class WvadOracle:
    def __init__(self, mode=0):
        oh1, oh2, lt, gt = MODES[mode]
        self.oh1, self.oh2 = oh1, oh2
        self.local_thr, self.global_thr = float(lt), float(gt)
        self.noise_means = NOISE_MEANS0.copy()
        self.speech_means = SPEECH_MEANS0.copy()
        self.noise_stds = NOISE_STDS0.copy()
        self.speech_stds = SPEECH_STDS0.copy()
        self.frame_counter = 0
        self.over_hang = 0
        self.num_of_speech = 0
        self.index_vector = np.zeros((6, 16))
        self.low_value_vector = np.full((6, 16), 10000.0 / 16)
        self.mean_value = np.full(6, 1600.0 / 16)
        self.ds_state = np.zeros(2)
        self.upper_state = np.zeros((5, 2))
        self.lower_state = np.zeros((5, 2))
        self.hp_state = np.zeros(4)

    # ---- filters ----

    @staticmethod
    def _allpass(x, c, s):
        y = np.zeros_like(x)
        for n in range(len(x)):
            y[n] = s[0] + c * x[n]
            s[0] = s[1]
            s[1] = x[n] - c * y[n]
        return y

    def _split(self, x, fb):
        a0 = self._allpass(x, C0, self.upper_state[fb])
        a1 = self._allpass(x, C1, self.lower_state[fb])
        return (a1[1::2] - a0[0::2]) / 2, (a1[1::2] + a0[0::2]) / 2

    def _hpf(self, x):
        s = self.hp_state
        y = np.zeros_like(x)
        for n in range(len(x)):
            y[n] = (HPZ[0] * x[n] + HPZ[1] * s[0] + HPZ[2] * s[1]) - (
                HPP[1] * s[2] + HPP[2] * s[3]
            )
            s[1] = s[0]
            s[0] = x[n]
            s[3] = s[2]
            s[2] = y[n]
        return y

    def _downsample(self, x):
        y = np.zeros(len(x) // 2)
        s0, s1 = self.ds_state
        for n in range(len(y)):
            a0 = (s0 + C0 * x[2 * n]) / 2
            s0 = x[2 * n] - (C0 * a0) * 2
            a1 = (s1 + C1 * x[2 * n + 1]) / 2
            s1 = x[2 * n + 1] - (C1 * a1) * 2
            y[n] = a0 + a1
        self.ds_state[:] = (s0, s1)
        return y.astype(np.int16).astype(np.float64)

    def _log_energy(self, x, offset, te):
        energy = float(np.sum(x**2))
        if energy > 0:
            log_energy = 10 * np.log10(energy) + offset
        else:
            return te, offset
        if te <= MIN_ENERGY:
            te += MIN_ENERGY + 1 if energy >= 16384.0 else energy
        return te, log_energy

    def _features(self, frame):
        x8 = self._downsample(frame)
        te = 0.0
        f = np.zeros(6)
        hp, lp = self._split(x8, 0)
        c, d = self._split(hp, 1)
        te, f[5] = self._log_energy(c, OFFSETS[5], te)
        te, f[4] = self._log_energy(d, OFFSETS[4], te)
        c, d = self._split(lp, 2)
        te, f[3] = self._log_energy(c, OFFSETS[3], te)
        e, g = self._split(d, 3)
        te, f[2] = self._log_energy(e, OFFSETS[2], te)
        h, i = self._split(g, 4)
        te, f[1] = self._log_energy(h, OFFSETS[1], te)
        k = self._hpf(i)
        te, f[0] = self._log_energy(k, OFFSETS[0], te)
        return te, f

    # ---- GMM ----

    def _find_minimum(self, value, ch):
        iv, lv = self.index_vector, self.low_value_vector
        for k in range(16):
            if iv[ch, k] != 100:
                iv[ch, k] += 1
            else:
                lv[ch, k:-1] = lv[ch, k + 1 :]
                iv[ch, k:-1] = iv[ch, k + 1 :]
                iv[ch, 15] = 101
                lv[ch, 15] = 10000.0 / 16
        for k in range(16):
            if value < lv[ch, k]:
                lv[ch, k + 1 :] = lv[ch, k:-1]
                iv[ch, k + 1 :] = iv[ch, k:-1]
                lv[ch, k] = value
                iv[ch, k] = 1
                break
        median = 1600.0 / 16
        if self.frame_counter > 2:
            median = lv[ch, 2]
        elif self.frame_counter > 0:
            median = lv[ch, 0]
        alpha = 0.0
        if self.frame_counter > 0:
            alpha = SMOOTH_DOWN if median < self.mean_value[ch] else SMOOTH_UP
        self.mean_value[ch] = (
            (alpha + 1.0 / 2**15) * self.mean_value[ch]
            + (1.0 - alpha) * median
            + 16384.0 / 2 ** (15 + 4)
        )
        return self.mean_value[ch]

    @staticmethod
    def _gauss(x, mean, std):
        q = (x - mean) * (x - mean) / (2.0 * std * std)
        return (np.exp(-q) if q < COMP_VAR else 0.0) / std

    @staticmethod
    def _wavg(data, offset, weights):
        data += offset
        return float(np.sum(data * weights))

    def _gmm(self, features, total_power):
        vadflag = 0
        ngprvec = np.zeros((2, 6))
        sgprvec = np.zeros((2, 6))
        if total_power > MIN_ENERGY:
            sum_llr = 0.0
            for ch in range(6):
                noise_prob = np.zeros(2)
                speech_prob = np.zeros(2)
                for g in range(2):
                    noise_prob[g] = NOISE_W[g, ch] * self._gauss(
                        features[ch], self.noise_means[g, ch], self.noise_stds[g, ch]
                    )
                    speech_prob[g] = SPEECH_W[g, ch] * self._gauss(
                        features[ch], self.speech_means[g, ch], self.speech_stds[g, ch]
                    )
                h0 = float(noise_prob.sum())
                h1 = float(speech_prob.sum())
                s0 = 31.0 if h0 <= 0 else (31 - 27 - np.log2(h0))
                s1 = 31.0 if h1 <= 0 else (31 - 27 - np.log2(h1))
                llr = s0 - s1
                sum_llr += llr * SPECTRUM_WEIGHT[ch]
                if llr * 4 > self.local_thr:
                    vadflag = 1
                if h0 > 0:
                    ngprvec[0, ch] = noise_prob[0] / h0
                    ngprvec[1, ch] = 1.0 - ngprvec[0, ch]
                else:
                    ngprvec[0, ch] = 1.0
                if h1 > 0:
                    sgprvec[0, ch] = speech_prob[0] / h1
                    sgprvec[1, ch] = 1.0 - sgprvec[0, ch]
            if sum_llr >= self.global_thr:
                vadflag = 1

            for ch in range(6):
                fmin = self._find_minimum(features[ch], ch)
                ngm = self._wavg(self.noise_means[:, ch], 0, NOISE_W[:, ch])
                for g in range(2):
                    nmk = self.noise_means[g, ch]
                    nsk = self.noise_stds[g, ch]
                    smk = self.speech_means[g, ch]
                    ssk = self.speech_stds[g, ch]
                    dn = (features[ch] - nmk) / (nsk * nsk)
                    ds = (features[ch] - smk) / (ssk * ssk)
                    tmp = (
                        nmk
                        + (NOISE_UPDATE * ngprvec[g, ch] * dn if vadflag == 0 else 0)
                        + BACK_ETA * (fmin - ngm)
                    )
                    self.noise_means[g, ch] = max(g + 5, min(tmp, 72 + g - ch))
                    if vadflag > 0:
                        tmp = smk + SPEECH_UPDATE * sgprvec[g, ch] * ds
                        self.speech_means[g, ch] = max(
                            MIN_MEAN[g], min(tmp, (12800.0 + 640.0) / 2**7)
                        )
                        ssk += sgprvec[g, ch] * (ds * (features[ch] - smk) - 1) * 0.1 / ssk
                        self.speech_stds[g, ch] = max(ssk, MIN_STD)
                    else:
                        nsk += ngprvec[g, ch] * (dn * (features[ch] - nmk) - 1) / nsk
                        self.noise_stds[g, ch] = max(nsk, MIN_STD)

                ngm = self._wavg(self.noise_means[:, ch], 0, NOISE_W[:, ch])
                sgm = self._wavg(self.speech_means[:, ch], 0, SPEECH_W[:, ch])
                diff = sgm - ngm
                if diff < MIN_DIFF[ch]:
                    t = MIN_DIFF[ch] - diff
                    sgm = self._wavg(self.speech_means[:, ch], 0.8 * t, SPEECH_W[:, ch])
                    ngm = self._wavg(self.noise_means[:, ch], -0.2 * t, NOISE_W[:, ch])
                if sgm > MAX_SPEECH[ch]:
                    sgm -= MAX_SPEECH[ch]
                    self.speech_means[:, ch] -= sgm
                if ngm > MAX_NOISE[ch]:
                    ngm -= MAX_NOISE[ch]
                    self.noise_means[:, ch] -= ngm
            self.frame_counter += 1

        if vadflag == 0:
            if self.over_hang > 0:
                vadflag = 2 + self.over_hang
                self.over_hang -= 1
            self.num_of_speech = 0
        else:
            self.num_of_speech += 1
            if self.num_of_speech > MAX_SPEECH_FRAMES:
                self.num_of_speech = MAX_SPEECH_FRAMES
                self.over_hang = self.oh2
            else:
                self.over_hang = self.oh1
        return vadflag

    def process(self, data):
        data = np.asarray(data, np.float64)
        n = len(data) // 160
        flags = np.zeros(n, int)
        self.features_log = []
        for k in range(n):
            te, f = self._features(data[k * 160 : (k + 1) * 160])
            self.features_log.append((te, f.copy()))
            flags[k] = self._gmm(f, te)
        return flags
