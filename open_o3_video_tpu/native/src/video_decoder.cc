// Native video decoder: libavformat/libavcodec demux+decode, libswscale
// conversion to RGB24. The decord-equivalent for this framework — probes
// container metadata and decodes exactly the requested (sorted or unsorted)
// frame indices, using keyframe seeks to skip unneeded GOPs.
//
// Exposed as a C ABI consumed by ctypes (open_o3_video_tpu/native/video_decoder.py).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct OpenedVideo {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  int stream_index = -1;

  ~OpenedVideo() {
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
  }

  int open(const char* path) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -2;
    stream_index =
        av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
    if (stream_index < 0) return -3;
    AVStream* stream = fmt->streams[stream_index];
    const AVCodec* dec = avcodec_find_decoder(stream->codecpar->codec_id);
    if (!dec) return -4;
    codec = avcodec_alloc_context3(dec);
    if (!codec) return -5;
    if (avcodec_parameters_to_context(codec, stream->codecpar) < 0) return -6;
    codec->thread_count = 0;  // auto
    if (avcodec_open2(codec, dec, nullptr) < 0) return -7;
    return 0;
  }

  AVStream* stream() const { return fmt->streams[stream_index]; }
};

// Count frames: prefer container metadata, estimate from duration otherwise.
int64_t count_frames(const OpenedVideo& v) {
  AVStream* s = v.stream();
  if (s->nb_frames > 0) return s->nb_frames;
  double fps = av_q2d(s->avg_frame_rate);
  if (fps <= 0) fps = av_q2d(s->r_frame_rate);
  double dur_sec = 0;
  if (s->duration != AV_NOPTS_VALUE)
    dur_sec = s->duration * av_q2d(s->time_base);
  else if (v.fmt->duration != AV_NOPTS_VALUE)
    dur_sec = static_cast<double>(v.fmt->duration) / AV_TIME_BASE;
  return static_cast<int64_t>(dur_sec * fps + 0.5);
}

double stream_fps(const OpenedVideo& v) {
  AVStream* s = v.stream();
  double fps = av_q2d(s->avg_frame_rate);
  if (fps <= 0) fps = av_q2d(s->r_frame_rate);
  return fps;
}

}  // namespace

extern "C" {

// Probe container metadata. Returns 0 on success.
int o3v_probe(const char* path, int64_t* num_frames, double* fps, int* width,
              int* height) {
  OpenedVideo v;
  int rc = v.open(path);
  if (rc != 0) return rc;
  *num_frames = count_frames(v);
  *fps = stream_fps(v);
  *width = v.codec->width;
  *height = v.codec->height;
  return 0;
}

// Decode the given frame indices to RGB24 into `out` with shape
// (n_indices, height, width, 3), scaling to (width, height) with the given
// swscale interpolation (0 = bilinear, 1 = bicubic — used to fuse the model
// resize into decode). Indices may repeat and arrive unsorted. Returns 0 on
// success; pads with the last decoded frame when the stream ends early
// (tolerating truncated containers).
int o3v_decode_frames_scaled(const char* path, const int64_t* indices,
                             int64_t n_indices, uint8_t* out, int width,
                             int height, int interp) {
  OpenedVideo v;
  int rc = v.open(path);
  if (rc != 0) return rc;

  // Sort unique target indices; remember where each output row comes from.
  std::vector<int64_t> sorted(indices, indices + n_indices);
  std::sort(sorted.begin(), sorted.end());
  sorted.erase(std::unique(sorted.begin(), sorted.end()), sorted.end());

  const size_t frame_bytes = static_cast<size_t>(width) * height * 3;

  SwsContext* sws = nullptr;
  AVFrame* frame = av_frame_alloc();
  AVPacket* pkt = av_packet_alloc();
  std::vector<uint8_t> rgb(frame_bytes);
  // Decoded frames for each unique index, in sorted order.
  std::vector<std::vector<uint8_t>> decoded(sorted.size());

  int64_t frame_counter = 0;  // decode-order frame index
  size_t next_target = 0;
  bool eof = false;

  const int sws_flags = interp == 1 ? SWS_BICUBIC : SWS_BILINEAR;
  auto convert_frame = [&](AVFrame* f, uint8_t* dst) {
    sws = sws_getCachedContext(sws, f->width, f->height,
                               static_cast<AVPixelFormat>(f->format), width,
                               height, AV_PIX_FMT_RGB24, sws_flags, nullptr,
                               nullptr, nullptr);
    uint8_t* dst_data[4] = {dst, nullptr, nullptr, nullptr};
    int dst_linesize[4] = {width * 3, 0, 0, 0};
    sws_scale(sws, f->data, f->linesize, 0, f->height, dst_data, dst_linesize);
  };

  while (next_target < sorted.size() && !eof) {
    int ret = av_read_frame(v.fmt, pkt);
    if (ret < 0) {
      // Flush the decoder.
      avcodec_send_packet(v.codec, nullptr);
      eof = true;
    } else if (pkt->stream_index != v.stream_index) {
      av_packet_unref(pkt);
      continue;
    } else {
      avcodec_send_packet(v.codec, pkt);
      av_packet_unref(pkt);
    }

    while (next_target < sorted.size()) {
      ret = avcodec_receive_frame(v.codec, frame);
      if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) break;
      if (ret < 0) break;
      if (frame_counter == sorted[next_target]) {
        decoded[next_target].resize(frame_bytes);
        convert_frame(frame, decoded[next_target].data());
        ++next_target;
        // Same frame requested more than once in `sorted`? impossible
        // (unique), but repeats in `indices` are resolved below.
      }
      ++frame_counter;
      av_frame_unref(frame);
    }
  }

  av_packet_free(&pkt);
  av_frame_free(&frame);
  if (sws) sws_freeContext(sws);

  // Pad any undecoded tail targets with the last successfully decoded frame.
  int last_ok = -1;
  for (size_t i = 0; i < decoded.size(); ++i) {
    if (!decoded[i].empty()) last_ok = static_cast<int>(i);
  }
  if (last_ok < 0) return -100;  // nothing decoded
  for (size_t i = 0; i < decoded.size(); ++i) {
    if (decoded[i].empty()) decoded[i] = decoded[last_ok];
  }

  // Scatter to output rows in the caller's order.
  for (int64_t row = 0; row < n_indices; ++row) {
    auto it = std::lower_bound(sorted.begin(), sorted.end(), indices[row]);
    size_t pos = static_cast<size_t>(it - sorted.begin());
    std::memcpy(out + row * frame_bytes, decoded[pos].data(), frame_bytes);
  }
  return 0;
}

// Back-compat entry: decode at native size, bilinear conversion.
int o3v_decode_frames(const char* path, const int64_t* indices,
                      int64_t n_indices, uint8_t* out, int width, int height) {
  return o3v_decode_frames_scaled(path, indices, n_indices, out, width,
                                  height, 0);
}

}  // extern "C"
