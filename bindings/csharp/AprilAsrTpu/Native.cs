// P/Invoke surface for libaprilasr_tpu (native/april_tpu_api.h).
//
// Binding parity with the reference's C# binding
// (reference: bindings/csharp/nuget/src/AprilAsrPINVOKE.cs — same role,
// written fresh against this framework's client library).

using System;
using System.Runtime.InteropServices;

namespace AprilAsrTpu
{
    public enum AprilResultKind
    {
        Unknown = 0,
        PartialRecognition = 1,
        FinalRecognition = 2,
        ErrorCantKeepUp = 3,
        Silence = 4,
    }

    [Flags]
    public enum AprilTokenFlags : uint
    {
        WordBoundary = 1,
        SentenceEnd = 2,
    }

    [StructLayout(LayoutKind.Sequential)]
    internal struct NativeToken
    {
        public IntPtr token;     // UTF-8, valid only during the handler call
        public float logprob;
        public uint flags;
        public UIntPtr timeMs;
        public IntPtr reserved;
    }

    [StructLayout(LayoutKind.Sequential)]
    internal struct NativeSpeakerId
    {
        [MarshalAs(UnmanagedType.ByValArray, SizeConst = 16)]
        public byte[] data;
    }

    [UnmanagedFunctionPointer(CallingConvention.Cdecl)]
    internal delegate void NativeResultHandler(
        IntPtr userdata, int resultType, UIntPtr count, IntPtr tokens);

    [StructLayout(LayoutKind.Sequential)]
    internal struct NativeConfig
    {
        public NativeSpeakerId speaker;
        public NativeResultHandler handler;
        public IntPtr userdata;
        public uint flags;
    }

    internal static class Native
    {
        private const string Lib = "aprilasr_tpu";

        internal const uint ConfigFlagAsyncRt = 1;
        internal const uint ConfigFlagAsyncNoRt = 2;
        internal const int AprilVersion = 1;

        [DllImport(Lib, CallingConvention = CallingConvention.Cdecl)]
        internal static extern void aam_api_init(int version);

        [DllImport(Lib, CallingConvention = CallingConvention.Cdecl,
                   CharSet = CharSet.Ansi)]
        internal static extern IntPtr aam_create_model(string endpoint);

        [DllImport(Lib, CallingConvention = CallingConvention.Cdecl)]
        internal static extern IntPtr aam_get_name(IntPtr model);

        [DllImport(Lib, CallingConvention = CallingConvention.Cdecl)]
        internal static extern IntPtr aam_get_description(IntPtr model);

        [DllImport(Lib, CallingConvention = CallingConvention.Cdecl)]
        internal static extern IntPtr aam_get_language(IntPtr model);

        [DllImport(Lib, CallingConvention = CallingConvention.Cdecl)]
        internal static extern UIntPtr aam_get_sample_rate(IntPtr model);

        [DllImport(Lib, CallingConvention = CallingConvention.Cdecl)]
        internal static extern void aam_free(IntPtr model);

        [DllImport(Lib, CallingConvention = CallingConvention.Cdecl)]
        internal static extern IntPtr aas_create_session(
            IntPtr model, NativeConfig config);

        [DllImport(Lib, CallingConvention = CallingConvention.Cdecl)]
        internal static extern void aas_feed_pcm16(
            IntPtr session, short[] pcm16, UIntPtr count);

        [DllImport(Lib, CallingConvention = CallingConvention.Cdecl)]
        internal static extern void aas_flush(IntPtr session);

        [DllImport(Lib, CallingConvention = CallingConvention.Cdecl)]
        internal static extern float aas_realtime_get_speedup(IntPtr session);

        [DllImport(Lib, CallingConvention = CallingConvention.Cdecl)]
        internal static extern void aas_free(IntPtr session);

        internal static string PtrToUtf8(IntPtr p)
        {
            return p == IntPtr.Zero ? "" : (Marshal.PtrToStringUTF8(p) ?? "");
        }
    }
}
